package graft

import graft.operators.{ParquetFile, ParquetWrite}
import java.nio.file.Files

/** Our Parquet WRITER (q216): Spark's reader, parquet-mr and our own
  * reader all consume files this codec produced. */
class ParquetWriteSpec extends SparkSpec {

  private def sample(n: Int): (Array[Long], Array[Long], Array[String]) =
    ((0 until n).map(_.toLong * 3).toArray,
      (0 until n).map(i => (i.toLong * 7) % 500 - 100).toArray,
      (0 until n).map(i => "é" * (i % 3) + "v" + i).toArray)

  private def fileBytes(n: Int): Array[Byte] = {
    val (ids, vs, ss) = sample(n)
    ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("id", ids),
      ParquetWrite.LongCol("v", vs),
      ParquetWrite.StrCol("s", ss)))
  }

  test("Spark's own reader consumes our bytes: values, schema and " +
      "row count all round-trip") {
    val n = 5000
    val dir = Files.createTempDirectory("graft_pqw_").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part-0.parquet"),
      fileBytes(n))
    val back = spark.read.parquet(dir)
    back.schema.fieldNames.toSeq shouldBe Seq("id", "v", "s")
    back.count() shouldBe n.toLong
    val (ids, vs, ss) = sample(n)
    val row = back.agg(
      org.apache.spark.sql.functions.sum("id"),
      org.apache.spark.sql.functions.sum("v"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("s")))).head()
    row.getLong(0) shouldBe ids.sum
    row.getLong(1) shouldBe vs.sum
    row.getLong(2) shouldBe ss.map(_.length.toLong).sum
    // spot-check exact row content through a filter
    val one = back.where("id = 63").head()
    one.getLong(1) shouldBe vs(21)
    one.getString(2) shouldBe ss(21)
  }

  test("parquet-mr's reader agrees on the footer it sees, including " +
      "our statistics") {
    val n = 2000
    val dir = Files.createTempDirectory("graft_pqw_mr_").toString
    val p = s"$dir/f.parquet"
    Files.write(java.nio.file.Paths.get(p), fileBytes(n))
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val ft = r.getFooter
      ft.getBlocks.size() shouldBe 1
      val bl = ft.getBlocks.get(0)
      bl.getRowCount shouldBe n.toLong
      bl.getColumns.size() shouldBe 3
      val idc = bl.getColumns.get(0)
      idc.getPath.toDotString shouldBe "id"
      idc.getValueCount shouldBe n.toLong
      val st = idc.getStatistics
        .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
      st.getMin shouldBe 0L
      st.getMax shouldBe (n - 1).toLong * 3
      // and parquet-mr can READ the pages, not just the footer
      val pages = r.readNextRowGroup()
      pages should not be null
    } finally r.close()
  }

  test("our own reader closes the loop: writer -> reader round trip " +
      "on every decoded aggregate") {
    val n = 1234
    val (ids, vs, ss) = sample(n)
    val bytes = fileBytes(n)
    val rows = ParquetFile.parseColumnSums(1L, bytes)
    rows.forall(_.valid) shouldBe true
    val byPath = rows.map(r => r.col_path -> r).toMap
    byPath("id").n_values shouldBe n.toLong
    byPath("id").n_nonnull shouldBe n.toLong // REQUIRED: no nulls
    byPath("id").sum_long shouldBe ids.sum
    byPath("v").sum_long shouldBe vs.sum
    byPath("s").sum_blen shouldBe
      ss.map(_.getBytes("UTF-8").length.toLong).sum
    byPath("s").sum_bytes shouldBe
      ss.map(_.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum).sum
    // the pruned read works against our own stats too
    val pruned = ParquetFile.parsePrunedSum(2L, bytes, "id", "v",
      300L, 900L)
    pruned.valid shouldBe true
    val want = ids.zip(vs).filter(t => t._1 >= 300L && t._1 <= 900L)
    pruned.n_rows_matched shouldBe want.length.toLong
    pruned.sum_val shouldBe want.map(_._2).sum
  }

  test("DuckDB-grade strictness holds: a corrupted byte breaks the " +
      "reader, and ragged/empty inputs are rejected at write time") {
    intercept[IllegalArgumentException] {
      ParquetWrite.writeFile(Nil)
    }
    intercept[IllegalArgumentException] {
      ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("a", Array(1L)),
        ParquetWrite.LongCol("b", Array(1L, 2L))))
    }
    intercept[IllegalArgumentException] {
      ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("a", Array.emptyLongArray)))
    }
    val bytes = fileBytes(100)
    val m = bytes.clone()
    m(m.length - 9) = (m(m.length - 9) ^ 0x40).toByte // inside footer
    ParquetFile.parse(1L, m).exists(_.valid) shouldBe false
  }
}
