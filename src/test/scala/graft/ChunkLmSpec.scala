package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Round-6 batch 2: content-defined chunking ([[Curation.cdcChunks]])
  * and per-group exact quantiles ([[Curation.groupQuantiles]]) — the
  * shift-resistance property that motivates CDC over fixed blocks, and
  * rank-exact quantile election. */
class ChunkLmSpec extends SparkSpec {
  import spark.implicits._

  test("cdcChunks: chunk identity survives a prefix insertion (the CDC property)") {
    // Same 60-token body; doc 1 carries 3 extra leading tokens. With
    // fixed-width blocks every block would shift and re-hash; with
    // content-defined boundaries all chunks beyond the first shared
    // boundary keep their keys.
    val body = (0 until 60).map(i => s"t$i").mkString(" ")
    val df = Seq((0L, body), (1L, s"pfx0 pfx1 pfx2 $body"))
      .toDF("doc_id", "text")
    val out = Curation.cdcChunks(df, col("doc_id"), col("text"), 8)
      .collect()
    val keys0 = out.filter(_.getLong(0) == 0L).map(_.getString(4)).toSet
    val keys1 = out.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val shared = keys0.intersect(keys1)
    // every chunk of doc 0 except (at most) its first — whose content
    // absorbs the insertion on doc 1's side — re-appears in doc 1
    shared.size should be >= keys0.size - 1
    shared.size should be >= 2 // non-vacuous: several chunks actually shared
    // each shared chunk is first in doc 0 (lower doc id), duplicate in doc 1
    out.filter(r => r.getLong(0) == 1L && shared.contains(r.getString(4)))
      .foreach(r => r.getLong(5) shouldBe 0L)
  }

  test("cdcChunks: chunks partition each document (starts/sizes tile the tokens)") {
    val df = Seq((7L, (0 until 40).map(i => s"w${i % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.cdcChunks(df, col("doc_id"), col("text"), 4)
      .orderBy("chunk_idx").collect()
    out.head.getLong(2) shouldBe 0L // first chunk starts at token 0
    // consecutive chunk_start = previous start + previous n_toks
    out.sliding(2).foreach {
      case Array(a, b) => b.getLong(2) shouldBe a.getLong(2) + a.getLong(3)
      case _ => ()
    }
    out.map(_.getLong(3)).sum shouldBe 40L // sizes sum to the token count
    out.map(_.getLong(1)).toSeq shouldBe out.indices.map(_.toLong) // dense idx
  }

  test("groupQuantiles: rank-exact election on a hand-computed frame") {
    // group "a": values 1..10 -> p50 = v at ceil(5)=rank 5 -> 5,
    // p90 = rank 9 -> 9, p99 = rank ceil(9.9)=10 -> 10.
    // group "b": single value 42 -> all quantiles = 42.
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toLong)) :+
      (("b", 42L, 99L))).toDF("g", "v", "id")
    val out = Curation.groupQuantiles(df, col("g"), col("v"), col("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out("a") shouldBe ((10L, 5L, 9L, 10L))
    out("b") shouldBe ((1L, 42L, 42L, 42L))
  }
}
