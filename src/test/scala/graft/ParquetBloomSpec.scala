package graft

import graft.operators.ParquetFile
import java.nio.file.Files

/** Parquet split-block Bloom filter (q211): xxHash64 + SBBF check
  * gated against parquet-mr's own filter object, plus the no-false-
  * negative law on real Spark-written files. */
class ParquetBloomSpec extends SparkSpec {

  private def fixture(n: Int): (String, Array[Byte]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqb_").toString
    (0 until n).map(i => (i.toLong * 3, s"v$i"))
      .toDF("k", "s")
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.block.size", (8 * 1024).toString)
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    (f.getPath, Files.readAllBytes(f.toPath))
  }

  test("xxHash64 and the SBBF check agree with parquet-mr's own " +
      "bloom filter on every probe") {
    val (path, bytes) = fixture(20000)
    val meta = ParquetFile.parseFooterMeta(bytes)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      spark.sparkContext.hadoopConfiguration)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = rdr.getFooter.getBlocks
      meta.rowGroups.length shouldBe blocks.size()
      for (bi <- meta.rowGroups.indices) {
        val c = meta.rowGroups(bi).chunks.head
        c.bloomOff should be > 0L
        val myBloom = ParquetFile.readBloom(bytes, c.bloomOff)
        val mr = rdr.readBloomFilter(blocks.get(bi).getColumns.get(0))
        mr should not be null
        // probe a dense grid: present (multiples of 3) and absent
        for (p <- -50L to 70000L by 7L) {
          val myHash = ParquetFile.bloomHashLong(p)
          myHash shouldBe mr.hash(p) // xxHash64 seed-0 differential
          ParquetFile.bloomMightContain(bytes, myBloom, myHash) shouldBe
            mr.findHash(myHash)
        }
      }
    } finally rdr.close()
  }

  test("no false negatives: every written key tests true in the row " +
      "group that holds it") {
    import spark.implicits._
    val (_, bytes) = fixture(20000)
    val ds = spark.createDataset(Seq((5L, bytes)))
    val probes = (0 until 20000).map(_.toLong * 3)
    val rows = ParquetFile.decodeBloomProbes(ds, "k", probes).collect()
    rows.length shouldBe probes.length
    rows.forall(_.valid) shouldBe true
    rows.forall(_.might) shouldBe true // present ⇒ might, no exceptions
    // absent keys: mostly false (false-positive rate is small), and
    // a corrupted header never throws
    val absent = ParquetFile.decodeBloomProbes(ds, "k",
      (0 until 5000).map(i => 1000000L + i)).collect()
    absent.count(_.might) should be < 300 // fpp ~1% at default ndv
    val m = bytes.clone()
    val off = ParquetFile.parseFooterMeta(bytes)
      .rowGroups.head.chunks.head.bloomOff
    m(off.toInt) = (m(off.toInt) ^ 0x7f).toByte
    val bad = ParquetFile.decodeBloomProbes(
      spark.createDataset(Seq((6L, m))), "k", Seq(0L)).collect()
    bad.exists(!_.valid) || bad.forall(_.valid) shouldBe true // no throw
  }
}
