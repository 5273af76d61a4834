package graft

import org.apache.spark.sql.functions._

import graft.sources.NcClassic
import graft.sources.NcClassic._

/** The dependency-free NetCDF-classic codec (S1 de-stubbed): writer ↔
  * parser round trips over every classic type and both offset widths,
  * banded file reads, codegen-synthesis byte parity with the writer,
  * and malformed-payload safety (the q134 contract: poisoned bytes
  * yield invalid, never an exception). */
class NcClassicSpec extends SparkSpec {

  private def sampleVars(h: Int, w: Int): Seq[(VarSpec, Array[Double])] = Seq(
    (VarSpec("d", NcDouble, Seq(0, 1)),
      Array.tabulate(h * w)(i => math.sin(i) * 1e3)),
    (VarSpec("f", NcFloat, Seq(0, 1)),
      Array.tabulate(h * w)(i => math.cos(i).toFloat.toDouble)),
    (VarSpec("i", NcInt, Seq(0, 1)),
      Array.tabulate(h * w)(i => (i * 7919 - 1000000).toDouble)),
    (VarSpec("s", NcShort, Seq(0, 1)),
      Array.tabulate(h * w)(i => ((i * 31) % 65536 - 32768).toDouble)),
    (VarSpec("b", NcByte, Seq(0, 1)),
      Array.tabulate(h * w)(i => ((i * 13) % 256 - 128).toDouble)))

  private val gatts = Seq(
    NcAttr("title", NcChar, 0, "synthesized scene", Array.empty),
    NcAttr("aoi", NcInt, 2, "", Array(3.0, 97.0)),
    NcAttr("scale", NcDouble, 1, "", Array(0.25)))

  for (version <- Seq(1, 2))
    test(s"CDF-$version writer → parser round trip, every classic type bit-exact") {
      val (h, w) = (6, 5)
      val b = NcClassic.bytes(version, Seq("line" -> h, "sample" -> w),
        gatts, sampleVars(h, w))
      val hd = parseHeader(b).getOrElse(fail("parse failed"))
      hd.version shouldBe version
      hd.numRecs shouldBe 0L
      hd.dims.map(d => d.name -> d.length) shouldBe
        Seq("line" -> h, "sample" -> w)
      hd.gatts.map(_.name) shouldBe Seq("title", "aoi", "scale")
      hd.gatts.head.text shouldBe "synthesized scene"
      hd.gatts(1).nums.toSeq shouldBe Seq(3.0, 97.0)
      hd.gatts(2).nums.toSeq shouldBe Seq(0.25)
      hd.vars.map(_.name) shouldBe Seq("d", "f", "i", "s", "b")
      // begins are strictly increasing, 4-aligned, first at header end
      hd.vars.map(_.begin).sliding(2).foreach {
        case Seq(a, c) => assert(a < c); case _ => ()
      }
      all(hd.vars.map(_.begin % 4)) shouldBe 0L
      // every cell of every type reads back bit-exact (float via its
      // f32 round trip, ints exactly)
      hd.vars.zip(sampleVars(h, w)).foreach { case (v, (spec, data)) =>
        val got = readFixedSlice(b, hd, v, 0L, h * w)
        val want = spec.ncType match {
          case NcFloat => data.map(d => d.toFloat.toDouble)
          case NcByte => data.map(d => d.toInt.toByte.toDouble)
          case NcShort => data.map(d => d.toInt.toShort.toDouble)
          case _ => data
        }
        got.toSeq shouldBe want.toSeq
      }
    }

  test("banded file read: one seek per band, slice == in-memory slice") {
    val (h, w) = (16, 8)
    val tmp = java.io.File.createTempFile("nc_band", ".nc")
    try {
      val b = NcClassic.bytes(2, Seq("line" -> h, "sample" -> w),
        Nil, sampleVars(h, w))
      val fo = new java.io.FileOutputStream(tmp); fo.write(b); fo.close()
      val hd = parseHeader(b).get
      val raf = new java.io.RandomAccessFile(tmp, "r")
      try hd.vars.foreach { v =>
        val fromFile = readFixedSlice(raf, hd, v, 5L * w, 7 * w)
        val fromMem = readFixedSlice(b, hd, v, 5L * w, 7 * w)
        fromFile.toSeq shouldBe fromMem.toSeq
      } finally raf.close()
    } finally { tmp.delete(): Unit }
  }

  test("codegen synthesis (ncPayload) is byte-identical to the writer") {
    // the q147 container, built BOTH ways for the same logical content:
    // proves the hex-assembly expression and the imperative writer agree
    // on every padding/offset rule of the spec
    import spark.implicits._
    val data = "the quick brown fox jumps!".getBytes("UTF-8") // 26 -> 24 bytes
    val cells = data.take(24).map(_.toDouble)
    for ((version, junk) <- Seq((1, 1), (1, 4), (2, 3), (2, 8))) {
      val fromExpr = Seq(Tuple1(data.take(24)))
        .toDF("data")
        .select(NcClassic.ncPayload(col("data"), lit(junk), lit(version)))
        .head().getAs[Array[Byte]](0)
      val fromWriter = NcClassic.bytes(version,
        Seq("line" -> 8, "sample" -> 3),
        Seq(NcAttr("title", NcChar, 0, "x" * junk, Array.empty)),
        Seq((VarSpec("sig", NcByte, Seq(0, 1)), cells)))
      assert(fromExpr.sameElements(fromWriter),
        s"v$version junk=$junk: expr ${fromExpr.length}B vs writer ${fromWriter.length}B")
    }
  }

  test("parseInfo: valid container → truth fields; sums are signed-byte exact") {
    val cells = Array.tabulate(9)(i => (i * 37 % 256 - 128).toDouble)
    val b = NcClassic.bytes(1, Seq("line" -> 3, "sample" -> 3),
      Seq(NcAttr("title", NcChar, 0, "xx", Array.empty)),
      Seq((VarSpec("sig", NcByte, Seq(0, 1)), cells)))
    val info = NcClassic.parseInfo(42L, b)
    info.valid shouldBe true
    info.version shouldBe 1
    info.n_dims shouldBe 2
    info.dim_line shouldBe 3L
    info.dim_sample shouldBe 3L
    info.title_len shouldBe 2L
    info.var_name shouldBe "sig"
    info.byte_sum shouldBe cells.map(_.toInt.toByte.toLong).sum
    info.energy shouldBe cells.map(d => { val x = d.toInt.toByte.toLong; x * x }).sum
  }

  test("malformed payloads: invalid, never an exception") {
    val good = NcClassic.bytes(1, Seq("line" -> 2, "sample" -> 3),
      Nil, Seq((VarSpec("sig", NcByte, Seq(0, 1)),
        Array.tabulate(6)(_.toDouble))))
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "not a netcdf at all".getBytes("UTF-8"),
      good.take(3) ++ Array(9.toByte) ++ good.drop(4), // version 9
      good.take(17),                                    // truncated mid-list
      good.updated(8, 0x0B.toByte),                     // wrong list tag
      good.updated(good.length - 10, 0x7f.toByte))      // begin beyond EOF
    cases.foreach { b =>
      val info = NcClassic.parseInfo(1L, b)
      info.valid shouldBe false
    }
    // deterministic byte fuzz: no input may throw
    val rnd = new scala.util.Random(20260814)
    (0 until 500).foreach { _ =>
      val n = rnd.nextInt(160)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (rnd.nextBoolean() && n >= 4) {
        b(0) = 'C'; b(1) = 'D'; b(2) = 'F'; b(3) = (1 + rnd.nextInt(2)).toByte
      }
      noException should be thrownBy NcClassic.parseInfo(0L, b)
    }
  }

  test("record dimension: parsed, flagged, and rejected by the fixed-slice reader") {
    // hand-build a header with a record dim (length 0) via the writer's
    // layout then patch the dim length — writer itself only emits fixed
    // vars, which is the documented scope
    val b = NcClassic.bytes(1, Seq("t" -> 4, "x" -> 3),
      Nil, Seq((VarSpec("v", NcInt, Seq(0, 1)),
        Array.tabulate(12)(_.toDouble))))
    val hd = parseHeader(b).get
    val recB = {
      // dim list entry "t": tag(4) n(4) | namelen(4) "t\0\0\0"(4) len(4)
      val lenOff = 8 + 8 + 4 + 4
      b.updated(lenOff, 0.toByte).updated(lenOff + 1, 0.toByte)
        .updated(lenOff + 2, 0.toByte).updated(lenOff + 3, 0.toByte)
    }
    val recH = parseHeader(recB).get
    recH.dims.head.length shouldBe 0
    recH.vars.head.isRecord(recH.dims) shouldBe true
    hd.vars.head.isRecord(hd.dims) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      readFixedSlice(recB, recH, recH.vars.head, 0L, 3)
    // and the q147 row stage degrades it to invalid, not an exception
    NcClassic.parseInfo(7L, recB).valid shouldBe false
  }
}
