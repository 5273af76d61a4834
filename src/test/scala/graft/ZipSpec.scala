package graft

import graft.operators.Zip

/** ZIP container walk (q205): differential against the JDK writer,
  * EOCD/central/local structural laws, never-throw fuzz. */
class ZipSpec extends SparkSpec {

  private def expected(id: Long, ne: Int, seed: Int): Zip.ZipInfo = {
    val es = (0 until ne).map { f =>
      val len = 20 + (seed + f) % 50
      val psum = (0 until len).map(j => ((seed + 3 * f + j) % 256).toLong).sum
      val defl = if ((seed + f) % 2 == 0) 0L else 1L
      (len.toLong, psum, defl, s"e${f}_$seed.txt".length.toLong)
    }
    Zip.ZipInfo(id, ne.toLong, es.map(_._3).sum, es.map(_._1).sum,
      es.map(_._2).sum, es.map(_._4).sum, valid = true)
  }

  test("round-trip differential vs the JDK writer over the grid") {
    for (ne <- Seq(1, 2, 3, 6, 10); seed <- 0 until 13) {
      val b = Zip.zipPayload(ne, seed)
      Zip.parse(ne * 100L + seed, b) shouldBe
        expected(ne * 100L + seed, ne, seed)
    }
  }

  test("the JDK reader agrees: entry names and sizes cross-checked " +
      "through java.util.zip.ZipInputStream") {
    val b = Zip.zipPayload(5, 7)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    var names = List.empty[String]
    var total = 0L
    var e = zin.getNextEntry
    while (e != null) {
      names ::= e.getName
      val buf = new Array[Byte](256)
      var n = zin.read(buf)
      while (n > 0) { total += n; n = zin.read(buf) }
      e = zin.getNextEntry
    }
    names.reverse shouldBe (0 until 5).map(f => s"e${f}_7.txt")
    total shouldBe expected(0L, 5, 7).sum_usize
  }

  test("structural strictness: every law is load-bearing") {
    val b = Zip.zipPayload(3, 4)
    def mut(f: Array[Byte] => Unit): Boolean = {
      val m = b.clone(); f(m); Zip.parse(1L, m).valid
    }
    mut(_ => ()) shouldBe true
    // EOCD signature gone
    mut(m => m(m.length - 22) = 'X') shouldBe false
    // entry count lies
    mut(m => m(m.length - 22 + 8) = 9) shouldBe false
    // cd offset off by one
    mut { m =>
      val o = m.length - 22 + 16
      m(o) = (m(o) + 1).toByte
    } shouldBe false
    // local header signature corrupted
    mut(m => m(0) = 'X') shouldBe false
    // payload bit flip → CRC mismatch (deflated entry data region)
    mut { m =>
      // flip a byte shortly after the first local header+name
      m(40) = (m(40) ^ 0x40).toByte
    } shouldBe false
    // truncations never throw
    for (keep <- 0 until b.length by 7) {
      Zip.parse(2L, java.util.Arrays.copyOf(b, keep)).valid shouldBe false
    }
  }

  test("EOCD comment is honored by the backward scan") {
    val b = Zip.zipPayload(2, 1)
    // append a comment: patch the EOCD comment length and extend
    val comment = "trailing archive comment".getBytes("ISO-8859-1")
    val m = java.util.Arrays.copyOf(b, b.length + comment.length)
    System.arraycopy(comment, 0, m, b.length, comment.length)
    m(b.length - 2) = (comment.length & 0xff).toByte
    m(b.length - 1) = ((comment.length >> 8) & 0xff).toByte
    Zip.parse(3L, m) shouldBe expected(3L, 2, 1)
    // but junk that does NOT match the comment-length law rejects
    val j = java.util.Arrays.copyOf(b, b.length + 3)
    j(b.length) = 1; j(b.length + 1) = 2; j(b.length + 2) = 3
    Zip.parse(4L, j).valid shouldBe false
  }

  test("random fuzz never throws") {
    val rnd = new scala.util.Random(17)
    val b = Zip.zipPayload(4, 9)
    for (_ <- 0 until 500) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Zip.parse(5L, m) // validity unspecified; must not throw
    }
    for (_ <- 0 until 200) {
      val g = Array.fill(22 + rnd.nextInt(300))(rnd.nextInt(256).toByte)
      Zip.parse(6L, g).valid shouldBe false
    }
  }

  test("decodeZip runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq((11L, Zip.zipPayload(3, 2))))
    Zip.decodeZip(ds).collect().toSeq shouldBe Seq(expected(11L, 3, 2))
  }
}
