package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** [[graft.operators.Pii]] — golden detection/redaction cases and the
  * rule-interaction invariants the q79 oracle gate relies on. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def reportOf(texts: String*) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    Pii.report(df, col("t"))
      .select("id", "n_email", "n_ip", "n_phone", "redacted")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
  }

  test("detects and redacts each category") {
    val Array(email, ip, phone, clean) = reportOf(
      "write to alice.b+tag@mail.example today",
      "host at 10.17.0.255 is up",
      "call 555-0134 now",
      "no pii here 1234 5.6 seven@ @eight")
    email shouldBe ((1L, 0L, 0L, "write to <EMAIL> today"))
    ip shouldBe ((0L, 1L, 0L, "host at <IP> is up"))
    phone shouldBe ((0L, 0L, 1L, "call <PHONE> now"))
    clean shouldBe ((0L, 0L, 0L, "no pii here 1234 5.6 seven@ @eight"))
  }

  test("counts multiple matches and redacts all of them") {
    val Array(r) = reportOf(
      "a@b.example then c@d.example via 10.0.0.1 and 192.168.4.7 tel 555-1000 or 555-9999")
    r shouldBe ((2L, 2L, 2L,
      "<EMAIL> then <EMAIL> via <IP> and <IP> tel <PHONE> or <PHONE>"))
  }

  test("word boundaries hold: no match inside longer digit runs") {
    // 5-part dotted run: the IPv4 pattern must not fire mid-run (the
    // leading \b fails inside digits; a 4-quad prefix ending before a
    // dot-digit continuation is still a regex match on both engines only
    // when the boundary holds — here 1.2.3.4.5 matches its first four
    // quads because '.' is not a word char. Pin the actual behavior so
    // the oracle and Spark agree BY TEST, not by hope.
    val Array(r) = reportOf("run 1.2.3.4.5 and x555-12345")
    // 1.2.3.4 matches (trailing \b sits between '4' and '.'); the
    // 9-digit-suffixed phone fails the trailing \b.
    r._2 shouldBe 1L
    r._3 shouldBe 0L
    r._4 shouldBe "run <IP>.5 and x555-12345"
  }

  test("redaction tags never create new matches (rule-order safety)") {
    val df = Seq((1L, "mix a@b.example 10.0.0.1 555-1234")).toDF("id", "t")
    val once = Pii.report(df, col("t")).select("redacted").as[String].head()
    val twice = Pii.report(df.select(col("id"), lit(once).as("t")), col("t"))
      .select("n_email", "n_ip", "n_phone").as[(Long, Long, Long)].head()
    twice shouldBe ((0L, 0L, 0L))
  }
}
