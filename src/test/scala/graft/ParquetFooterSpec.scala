package graft

import graft.operators.ParquetFile
import java.nio.file.Files

/** Parquet footer walk (q202): Thrift compact-protocol decode gated
  * DIFFERENTIALLY against parquet-mr's own reader over files written
  * by Spark's real writer — never against fixtures this codec
  * produced (the JPEG-vs-JDK stance). */
class ParquetFooterSpec extends SparkSpec {

  /** Spark-written single-file fixture; returns (path, bytes). */
  private def fixture(n: Int, blockSize: Int, codec: String,
                      dict: Boolean): (String, Array[Byte]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqf_").toString
    (0 until n).map(i => (i.toLong, (i.toLong * 7) % 1000 - 300,
        "s" * (1 + i % 5) + i.toString))
      .toDF("id", "v", "s")
      .repartition(1).sortWithinPartitions("id")
      .write.mode("overwrite")
      .option("compression", codec)
      .option("parquet.block.size", blockSize.toString)
      .option("parquet.page.size", (blockSize / 4).toString)
      .option("parquet.enable.dictionary", dict.toString)
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    (f.getPath, Files.readAllBytes(f.toPath))
  }

  private def mrFooter(path: String) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  test("differential vs parquet-mr: every decoded field matches the " +
      "reference reader (uncompressed, no dictionary)") {
    val (path, bytes) = fixture(5000, 64 * 1024, "uncompressed",
      dict = false)
    val mine = ParquetFile.parseFooterMeta(bytes)
    val ref = mrFooter(path)
    val blocks = ref.getBlocks
    mine.numRows shouldBe blocks.stream()
      .mapToLong(_.getRowCount).sum()
    mine.rowGroups.length shouldBe blocks.size()
    mine.leaves.map(_.path) shouldBe Vector("id", "v", "s")
    mine.leaves.map(_.ptype) shouldBe Vector(2, 2, 6) // INT64/INT64/BYTE_ARRAY
    // primitive Scala columns are non-nullable → REQUIRED → maxDef 0
    mine.leaves.map(_.maxDef) shouldBe Vector(0, 0, 1)
    mine.leaves.map(_.maxRep) shouldBe Vector(0, 0, 0)
    for (i <- mine.rowGroups.indices) {
      val rg = mine.rowGroups(i); val bl = blocks.get(i)
      rg.numRows shouldBe bl.getRowCount
      rg.totalByteSize shouldBe bl.getTotalByteSize
      rg.chunks.length shouldBe bl.getColumns.size()
      for (j <- rg.chunks.indices) {
        val c = rg.chunks(j); val rc = bl.getColumns.get(j)
        c.path shouldBe rc.getPath.toDotString
        c.numValues shouldBe rc.getValueCount
        c.totalCompressed shouldBe rc.getTotalSize
        c.totalUncompressed shouldBe rc.getTotalUncompressedSize
        c.dataPageOff shouldBe rc.getFirstDataPageOffset
        c.codec shouldBe rc.getCodec.getParquetCompressionCodec.getValue
        if (c.path != "s") {
          val st = rc.getStatistics
            .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
          c.stats.minLong shouldBe Some(st.getMin)
          c.stats.maxLong shouldBe Some(st.getMax)
        }
      }
    }
  }

  test("multiple row groups: tiny block size forces >1 rg; per-rg rows " +
      "sum to the file total and per-rg stats match parquet-mr") {
    val (path, bytes) = fixture(60000, 4 * 1024, "uncompressed",
      dict = false)
    val mine = ParquetFile.parseFooterMeta(bytes)
    val ref = mrFooter(path)
    mine.rowGroups.length should be > 1
    mine.rowGroups.length shouldBe ref.getBlocks.size()
    mine.rowGroups.map(_.numRows).sum shouldBe 60000L
    for (i <- mine.rowGroups.indices) {
      val idChunk = mine.rowGroups(i).chunks.head
      val st = ref.getBlocks.get(i).getColumns.get(0).getStatistics
        .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
      idChunk.stats.minLong shouldBe Some(st.getMin)
      idChunk.stats.maxLong shouldBe Some(st.getMax)
    }
  }

  test("snappy + dictionary (Spark defaults): codec field reads SNAPPY " +
      "and the dictionary page offset is populated") {
    val (_, bytes) = fixture(3000, 128 * 1024, "snappy", dict = true)
    val mine = ParquetFile.parseFooterMeta(bytes)
    // the all-unique `id` column ABANDONS dictionary encoding
    // (parquet-mr falls back to PLAIN when the dict outgrows its
    // budget) — the low-cardinality `v` column keeps it
    val v = mine.rowGroups.head.chunks(1)
    v.codec shouldBe 1 // SNAPPY
    v.dictPageOff should be > 0L
    // dictionary encodings advertised (PLAIN_DICTIONARY=2 or
    // RLE_DICTIONARY=8 depending on writer version)
    v.encodings.exists(e => e == 2 || e == 8) shouldBe true
  }

  test("INT32 statistics sign-extend (negative min survives the 4-byte " +
      "little-endian decode)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqf_i32_").toString
    (-50 until 50).map(i => i).toDF("k")
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite").option("compression", "uncompressed")
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val mine = ParquetFile.parseFooterMeta(Files.readAllBytes(f.toPath))
    mine.leaves shouldBe Vector(ParquetFile.Leaf("k", 1, 0, 0)) // INT32
    mine.rowGroups.head.chunks.head.stats.minLong shouldBe Some(-50L)
    mine.rowGroups.head.chunks.head.stats.maxLong shouldBe Some(49L)
  }

  test("never-throw: truncation at every boundary and random mutation " +
      "produce valid=false, not an exception") {
    val (_, bytes) = fixture(500, 64 * 1024, "snappy", dict = true)
    ParquetFile.parse(1L, bytes).forall(_.valid) shouldBe true
    // every truncation that cuts the footer or framing must reject
    for (keep <- Seq(0, 1, 4, 8, 11, bytes.length / 2,
        bytes.length - 9, bytes.length - 1)) {
      val t = java.util.Arrays.copyOf(bytes, keep)
      val rows = ParquetFile.parse(2L, t)
      rows.exists(_.valid) shouldBe false
    }
    // corrupt footer length: points outside the file
    val m = bytes.clone()
    m(m.length - 8) = 0xff.toByte; m(m.length - 7) = 0xff.toByte
    m(m.length - 6) = 0xff.toByte; m(m.length - 5) = 0x7f.toByte
    ParquetFile.parse(3L, m).exists(_.valid) shouldBe false
    // corrupt trailing magic
    val m2 = bytes.clone(); m2(m2.length - 1) = 'X'.toByte
    ParquetFile.parse(4L, m2).exists(_.valid) shouldBe false
    // random byte flips inside the footer region: never throw
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val m3 = bytes.clone()
      val i = m3.length - 9 - rnd.nextInt(200)
      m3(i) = (m3(i) ^ (1 << rnd.nextInt(8))).toByte
      ParquetFile.parse(5L, m3) // must not throw; validity unspecified
    }
  }

  test("decodeFooters runs map-side over a Dataset") {
    import spark.implicits._
    val (_, bytes) = fixture(200, 64 * 1024, "uncompressed", dict = false)
    val ds = spark.createDataset(Seq((7L, bytes)))
    val rows = ParquetFile.decodeFooters(ds).collect()
    rows.foreach(_.valid shouldBe true)
    rows.map(_.n_values).sum shouldBe 600L // 3 columns × 200 rows
    rows.foreach(_.media_id shouldBe 7L)
  }
}
