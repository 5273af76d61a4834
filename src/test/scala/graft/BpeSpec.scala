package graft

import graft.operators.Bpe

/** Real BPE application (VERDICT r7 #7): golden merge sequences,
  * the fixpoint/reassembly laws, and distributed-vs-local parity. */
class BpeSpec extends SparkSpec {

  private val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "a" -> "n", "r" -> "e", "o" -> "n",
    "e" -> "r", "th" -> "e", "an" -> "d", "in" -> "g", "e" -> "n",
    "o" -> "r", "e" -> "s", "a" -> "t", "o" -> "u", "i" -> "t",
    "a" -> "l", "s" -> "t", "the" -> "r", "er" -> "s", "on" -> "g")
  private val rank = merges.zipWithIndex.toMap
  private val outId = merges.zipWithIndex.map { case ((l, r), k) =>
    (l + r) -> (1000L + k)
  }.toMap

  private def enc(w: String): Vector[(String, Long)] =
    Bpe.encodeWord(w, rank, outId)

  test("golden merges: compositional depth and rank priority") {
    enc("the").map(_._1) shouldBe Vector("the")
    enc("the").map(_._2) shouldBe Vector(1006L)
    // (e,r) rank 5 outranks (th,e) rank 6, so "the" never forms here —
    // rank priority, not longest-match
    enc("thermal").map(_._1) shouldBe Vector("th", "er", "m", "al")
    enc("thermal").map(_._2) shouldBe Vector(1000L, 1005L, 'm'.toLong, 1015L)
    enc("rather").map(_._1) shouldBe Vector("r", "a", "th", "er")
    enc("and").map(_._1) shouldBe Vector("and")
    enc("inning").map(_._1) shouldBe Vector("in", "n", "ing")
    enc("strong").map(_._1) shouldBe Vector("st", "r", "ong")
    enc("z").map(_._2) shouldBe Vector('z'.toLong)
    enc("").map(_._1) shouldBe Vector()
  }

  test("leftmost tie-break: overlapping occurrences group left-greedily") {
    // (r,e) rank 3 beats (e,r) rank 5 in "erer" — rank priority again
    enc("erer").map(_._1) shouldBe Vector("e", "re", "r")
    // the observable leftmost case needs a self-overlapping pair:
    // with a+a as the only merge, "aaa" → [aa, a], never [a, aa]
    val rk2 = Map(("a", "a") -> 0, ("aa", "aa") -> 1)
    val id2 = Map("aa" -> 1000L, "aaaa" -> 1001L)
    Bpe.encodeWord("aaa", rk2, id2).map(_._1) shouldBe Vector("aa", "a")
    Bpe.encodeWord("aaaaa", rk2, id2).map(_._1) shouldBe Vector("aaaa", "a")
    Bpe.encodeWord("aaaaaa", rk2, id2).map(_._1) shouldBe Vector("aaaa", "aa")
  }

  test("laws: reassembly, fixpoint, and id consistency (fuzz)") {
    val rnd = new scala.util.Random(8)
    val alpha = "aeionrstdghl"
    (0 until 2000).foreach { _ =>
      val w = (0 until (1 + rnd.nextInt(14)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val toks = enc(w)
      // tokens reassemble the word exactly
      toks.map(_._1).mkString shouldBe w
      // fixpoint: no adjacent pair is still mergeable
      toks.map(_._1).sliding(2).foreach {
        case Seq(a, b) => rank.contains((a, b)) shouldBe false
        case _ => ()
      }
      // id consistency: single char ↔ codepoint, merged ↔ 1000+rank
      toks.foreach { case (t, id) =>
        if (t.length == 1) id shouldBe t.codePointAt(0).toLong
        else id shouldBe outId(t)
      }
    }
  }

  test("tokenize: distributed long-format output matches encodeWord locally") {
    import spark.implicits._
    val df = Seq((1L, "  the thermal  strong\npath "), (2L, ""), (3L, "xy"))
      .toDF("doc_id", "text").as[(Long, String)]
    val got = Bpe.tokenize(df, merges).collect()
      .sortBy(t => (t.doc_id, t.word_idx, t.pos))
    val wordsOf1 = Seq("the", "thermal", "strong", "path")
    val want1 = wordsOf1.zipWithIndex.flatMap { case (w, wi) =>
      enc(w).zipWithIndex.map { case ((t, id), p) => (1L, wi + 1, p + 1, t, id) }
    }
    got.filter(_.doc_id == 1L)
      .map(t => (t.doc_id, t.word_idx, t.pos, t.token, t.token_id))
      .toSeq shouldBe want1
    got.count(_.doc_id == 2L) shouldBe 0 // empty text → zero rows
    got.filter(_.doc_id == 3L).map(_.token).toSeq shouldBe Seq("x", "y")
  }

  test("merges artifact: save/load round trip preserves content and rank order") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toFile
    try {
      Bpe.saveMerges(spark, merges, dir.getAbsolutePath + "/m")
      val loaded = Bpe.loadMerges(spark, dir.getAbsolutePath + "/m")
      loaded shouldBe merges // exact pairs, exact order (rank column, not file order)
      // applying the loaded artifact tokenizes identically
      loaded.zipWithIndex.foreach { case (_, _) => () }
      val viaLoaded = Bpe.encodeWord("thermal",
        loaded.zipWithIndex.toMap,
        loaded.zipWithIndex.map { case ((l, r), k) => (l + r) -> (1000L + k) }.toMap)
      viaLoaded shouldBe enc("thermal")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("guards: duplicate pair or duplicate output is rejected") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("doc_id", "text").as[(Long, String)]
    an[IllegalArgumentException] should be thrownBy
      Bpe.tokenize(df, Seq("a" -> "b", "a" -> "b"))
    an[IllegalArgumentException] should be thrownBy
      Bpe.tokenize(df, Seq("a" -> "bc", "ab" -> "c"))
  }
}
