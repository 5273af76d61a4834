package graft

import org.apache.spark.sql.functions._
import graft.functions.IceCodes

/** Truth values hand-derived from the reference encoders
  * (`/root/reference/asip_v2/hot_encoding_utils.py:10-145`) and the codes
  * parser (`archive.py:229-248`, `tests/test_archive.py:284-303`) —
  * including the F9 negative-index quirk (f[icetype-1] with icetype==0
  * credits the multi-year slot) and the F10 fallback overwrite.
  */
class IceCodesSpec extends SparkSpec {
  import spark.implicits._

  private def binary(ct: Int, ca: Int, sa: Int, cb: Int, sb: Int,
                     cc: Int, sc: Int): Seq[Int] = {
    val df = Seq((ct, ca, sa, cb, sb, cc, sc))
      .toDF("ct", "ca", "sa", "cb", "sb", "cc", "sc")
    df.select(IceCodes.oneHotBinary(col("ct"), col("ca"), col("sa"),
        col("cb"), col("sb"), col("cc"), col("sc")).as("v"))
      .as[Seq[Int]].head()
  }

  private def continuous(ct: Int, ca: Int, sa: Int, cb: Int, sb: Int,
                         cc: Int, sc: Int): Seq[Double] = {
    val df = Seq((ct, ca, sa, cb, sb, cc, sc))
      .toDF("ct", "ca", "sa", "cb", "sb", "cc", "sc")
    df.select(IceCodes.oneHotContinuous(col("ct"), col("ca"), col("sa"),
        col("cb"), col("sb"), col("cc"), col("sc")).as("v"))
      .as[Seq[Double]].head()
  }

  test("iceType stage->class mapping (hot_encoding_utils.py:10-41)") {
    val stages = Seq(0, 81, 85, 86, 93, 95, 97, 43, 94, 98, -9)
    val out = stages.toDF("s")
      .select(IceCodes.iceType(col("s")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    out shouldBe Array(Some(0), Some(1), Some(1), Some(2), Some(2),
      Some(3), Some(3), None, None, None, None)
  }

  test("one_hot_binary: open water when ct < 10") {
    binary(5, 30, 83, -9, -9, -9, -9) shouldBe Seq(1, 0, 0, 0)
  }

  test("one_hot_binary: argmax of accumulated fractions") {
    // f = [30 (young), 40 (FY), 0]; argmax+1 = 2 -> slot 2
    binary(80, 30, 83, 40, 87, -9, 95) shouldBe Seq(0, 0, 1, 0)
  }

  test("one_hot_binary: FIRST max wins ties (np.argmax)") {
    // f = [30, 30, 0] -> argmax = 0 -> icetype 1
    binary(80, 30, 81, 30, 86, -9, -9) shouldBe Seq(0, 1, 0, 0)
  }

  test("one_hot_binary: ice-free component credits f[-1] (the multi-year quirk)") {
    // sa=0 -> icetype 0 -> f[0-1] = f[-1] = f[2] += 30 -> argmax+1 = 3
    binary(80, 30, 0, -9, -9, -9, -9) shouldBe Seq(0, 0, 0, 1)
  }

  test("one_hot_binary: all-zero fractions fall back to ice_type(sa)") {
    binary(50, -9, 86, -9, -9, -9, -9) shouldBe Seq(0, 0, 1, 0)
  }

  test("one_hot_binary: unmapped fallback stage leaves all-zero vector") {
    // sa=50 -> ice_type None -> result stays [0,0,0,0] (the None guard)
    binary(50, -9, 50, -9, -9, -9, -9) shouldBe Seq(0, 0, 0, 0)
  }

  test("withOneHotBinary matches the single-Column form") {
    val codes = (0 until 200).map { i =>
      (i, i % 110, if (i % 11 == 0) -9 else i % 40, (i * 7) % 100,
        if (i % 13 == 0) -9 else i % 37, (i * 3) % 100,
        if (i % 17 == 0) -9 else i % 31, (i * 5) % 100)
    }.toDF("id", "ct", "ca", "sa", "cb", "sb", "cc", "sc")
    val viaDf = IceCodes.withOneHotBinary(codes, col("ct"), col("ca"),
        col("sa"), col("cb"), col("sb"), col("cc"), col("sc"))
      .select(col("id"), col("r0"), col("r1"), col("r2"), col("r3"))
    val viaCol = codes.select(col("id"),
      IceCodes.oneHotBinary(col("ct"), col("ca"), col("sa"), col("cb"),
        col("sb"), col("cc"), col("sc")).as("v"))
      .select(col("id") +: (0 to 3).map(k => element_at(col("v"), k + 1).as(s"r$k")): _*)
    viaDf.exceptAll(viaCol).count() shouldBe 0
    viaCol.exceptAll(viaDf).count() shouldBe 0
  }

  test("one_hot_continous: accumulate + residual r0 = 1 - sum(r1:)") {
    val r = continuous(80, 30, 83, 40, 87, -9, 95)
    r(1) shouldBe 0.3 +- 1e-12
    r(2) shouldBe 0.4 +- 1e-12
    r(3) shouldBe 0.0
    r(0) shouldBe (1.0 - (r(1) + r(2) + r(3)))
  }

  test("one_hot_continous: all-zero fallback sets r0 and r[ice_type(sa)]") {
    val r = continuous(60, -9, 81, -9, -9, -9, -9)
    r(0) shouldBe 0.4 +- 1e-12
    r(1) shouldBe 0.6 +- 1e-12
    r(2) shouldBe 0.0
    r(3) shouldBe 0.0
  }

  test("one_hot_continous: sa=0 fallback OVERWRITES r0 with ct/100") {
    val r = continuous(60, -9, 0, -9, -9, -9, -9)
    r shouldBe Seq(0.6, 0.0, 0.0, 0.0)
  }

  test("property: continuous encoding sums to 1 — except the sa=0 fallback overwrite quirk") {
    // The REFERENCE itself breaks the sum-to-1 law when all partial
    // concentrations are absent AND ice_type(sa)==0: result[0]=1-ct/100
    // is then OVERWRITTEN by ct/100 (hot_encoding_utils.py:138-141),
    // leaving sum = ct/100. Verified against the Python directly
    // (e.g. ct=10, all ci=-9, sa=0 -> [0.1,0,0,0]). The engine must
    // replicate the quirk, so the property is two-branched.
    val rnd = new scala.util.Random(42)
    val stages = Array(0, 81, 83, 85, 86, 90, 93, 95, 96, 97)
    val concs = Array(-9, 0, 10, 20, 30, 40, 50)
    def st() = stages(rnd.nextInt(stages.length))
    def cn() = concs(rnd.nextInt(concs.length))
    val cases = (0 until 500).map(_ =>
      (10 + rnd.nextInt(91), cn(), st(), cn(), st(), cn(), st()))
    val sums = cases.toDF("ct", "ca", "sa", "cb", "sb", "cc", "sc")
      .select(aggregate(
        IceCodes.oneHotContinuous(col("ct"), col("ca"), col("sa"),
          col("cb"), col("sb"), col("cc"), col("sc")),
        lit(0.0), (a, v) => a + v).as("s"))
      .as[Double].collect()
    cases.zip(sums).foreach { case ((ct, ca, sa, cb, _, cc, _), s) =>
      val fallbackOverwrite = ca <= 0 && cb <= 0 && cc <= 0 && sa == 0
      val expected = if (fallbackOverwrite) ct / 100.0 else 1.0
      s shouldBe expected +- 1e-9
    }
  }

  test("parsePolygonCodes: header dropped, fields typed (test_archive.py:284-303)") {
    val raw = Seq(
      ("s0", "id;CT;CA;SA;FA;CB;SB;FB;CC;SC;FC;CN;CD;CF;POLY_TYPE"),
      ("s0", "33;92;-9;91; 8;-9;-9;-9;-9;-9;-9;-9;-9;-9;I"),
      ("s0", "35;92;-9;91; 8;-9;-9;-9;-9;-9;-9;98;-9;-9;I")
    ).toDF("scene", "row")
    val out = IceCodes.parsePolygonCodes(raw)
    out.count() shouldBe 2
    val r33 = out.filter(col("poly_id") === 33).head()
    r33.getAs[Int]("ct") shouldBe 92
    r33.getAs[Int]("ca") shouldBe -9
    r33.getAs[Int]("sa") shouldBe 91
    r33.getAs[Int]("fa") shouldBe 8 // ' 8' trims to 8 on int cast
  }

  test("encode dispatch rejects unknown encodings (utility.py:56-57)") {
    val codes = Seq((1, 80, 30, 83, -9, -9, -9, -9))
      .toDF("poly_id", "ct", "ca", "sa", "cb", "sb", "cc", "sc")
    an[IllegalArgumentException] should be thrownBy
      IceCodes.encode(codes, "nope")
    IceCodes.encode(codes, "binary").columns should contain allOf ("r0", "r1", "r2", "r3")
  }
}
