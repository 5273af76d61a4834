package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** L8 upgraded (VERDICT r7 #7): REAL byte-pair-encoding tokenizer
  * application — not a token-count approximation. Given an ordered
  * merges table (the GPT-2 `merges.txt` artifact shape: rank k merges
  * adjacent pair (lₖ, rₖ) into lₖrₖ), each whitespace word starts as
  * its code-point sequence and repeatedly merges the LEFTMOST
  * occurrence of the best-ranked (lowest k) adjacent pair until no
  * pair in the table is adjacent — the deterministic one-occurrence-
  * per-step formulation, which reaches the same fixpoint as the
  * classic merge-all-occurrences loop (re-choosing the same best pair
  * while it remains present) and is directly expressible as a DuckDB
  * recursive CTE, which is what lets q150 hash-gate real token-id
  * output.
  *
  * Token ids: a single code point is its own id (the byte-level base
  * vocab analog); a merged token's id is 1000 + its merge rank — so
  * ids are a pure function of the merges artifact, no separate vocab
  * table to drift.
  *
  * 100 TB shape: the merges table is a bounded BROADCAST artifact
  * (tens of thousands of rows for real tokenizers — the L43 unigram-LM
  * precedent); tokenization is pure map-side `mapPartitions` (the
  * documented imperative seam: a per-word greedy loop is not column
  * algebra); text never shuffles — downstream sees (doc, pos,
  * token_id) rows, the exact shape sequence packing (L21) consumes.
  */
object Bpe {

  final case class BpeToken(doc_id: Long, word_idx: Int, pos: Int,
                            token: String, token_id: Long)

  /** Greedy BPE over one word (code-point granular). Exposed for the
    * law specs; the distributed entry point is [[tokenize]]. */
  private[graft] def encodeWord(word: String,
                                rank: Map[(String, String), Int],
                                outId: Map[String, Long]): Vector[(String, Long)] = {
    var seq = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var done = seq.length < 2
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < seq.length - 1) {
        val r = rank.getOrElse((seq(i), seq(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i } // strict < keeps the LEFTMOST
        i += 1
      }
      if (at < 0) done = true
      else {
        seq = seq.patch(at, Seq(seq(at) + seq(at + 1)), 2)
        if (seq.length < 2) done = true
      }
    }
    seq.map { t =>
      val id = outId.getOrElse(t,
        if (t.codePointCount(0, t.length) == 1) t.codePointAt(0).toLong
        else throw new IllegalStateException(
          s"token '$t' is multi-char but not a merge output — merges table inconsistent"))
      (t, id)
    }
  }

  /** Persist a merges table as ONE rank-ordered parquet file — the
    * tokenizer-artifact lifecycle (the L103 codebook precedent): a
    * production pipeline trains merges once, publishes the artifact,
    * and every ingest job loads it. Rank is stored explicitly so the
    * file's row order is irrelevant to correctness. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), k) => (k, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).sortWithinPartitions("rank")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merges artifact back into rank order. The collect is
    * merges-table sized (tens of thousands of rows for real
    * tokenizers) — the documented bounded-artifact precedent, never a
    * corpus collect. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select("rank", "left", "right").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Tokenize (doc_id, text) rows: whitespace words (the house
    * `tokens()` split), greedy BPE per word, long-format output —
    * one row per produced token. `merges` must have distinct pairs
    * and distinct concatenated outputs (real merges tables do; the
    * guard keeps rank lookup and id assignment unambiguous). */
  def tokenize(docs: Dataset[(Long, String)],
               merges: Seq[(String, String)]): Dataset[BpeToken] = {
    require(merges.map(p => p).distinct.size == merges.size,
      "duplicate merge pair")
    require(merges.map { case (l, r) => l + r }.distinct.size == merges.size,
      "duplicate merge output")
    val rank = merges.zipWithIndex.toMap
    val outId = merges.zipWithIndex.map { case ((l, r), k) =>
      (l + r) -> (1000L + k)
    }.toMap
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        val words = text.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty)
        words.iterator.zipWithIndex.flatMap { case (w, wi) =>
          encodeWord(w, rank, outId).iterator.zipWithIndex.map {
            case ((tok, id), pos) => BpeToken(docId, wi + 1, pos + 1, tok, id)
          }
        }
      }
    }
  }

  /** One non-overlapping left-to-right pass of merge `(l, r) -> l+r`
    * over a token-array column — the Sennrich TRAINING application
    * step, as pure column algebra (an `aggregate` HOF with an
    * (out, carry) struct accumulator: carry holds the candidate left
    * token; seeing `r` behind an `l` carry emits the merged token and
    * clears the carry, so a consumed `r` can never double as the next
    * occurrence's `l`).
    *
    * Equivalence law (spec-pinned, and what lets the q157 oracle use a
    * different formulation): for a single pair, one-pass
    * left-to-right == repeatedly merging the LEFTMOST occurrence until
    * none remains, because merging (l, r) can never create a new
    * (l, r) adjacency — the merged token l+r equals neither l nor r
    * (both non-empty), so the new adjacencies (prev, l+r) and
    * (l+r, next) never match the pair, and everything right of a merge
    * point is untouched. */
  private[graft] def applyMergeCol(seqCol: Column, l: String, r: String): Column = {
    require(l.nonEmpty && r.nonEmpty, "merge pair tokens must be non-empty")
    val init = struct(
      expr("CAST(array() AS ARRAY<STRING>)").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(seqCol, init,
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, struct(out.as("out"), x.as("carry")))
          .when(carry === lit(l) && x === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("carry")))
          .otherwise(struct(concat(out, array(carry)).as("out"),
            x.as("carry")))
      },
      acc => when(acc.getField("carry").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("carry")))))
  }

  /** Scala reference for [[applyMergeCol]] — the law specs diff the two. */
  private[graft] def applyMergeRef(seq: Vector[String], l: String,
                                   r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < seq.length) {
      if (i < seq.length - 1 && seq(i) == l && seq(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += seq(i); i += 1 }
    }
    b.result()
  }

  /** BPE merge TRAINING (L111 — the train side of [[tokenize]]'s
    * apply): learn `nMerges` merges from a corpus, Sennrich-style.
    * Each round counts adjacent token pairs over the VOCABULARY
    * (distinct words weighted by corpus frequency — training never
    * iterates the corpus itself), picks the globally most frequent
    * pair (ties broken lexicographically on (left, right) — a total,
    * engine-portable order), records it, and applies it to every
    * word's token sequence before the next round — the incremental
    * formulation, which is the actual training semantics (a greedy
    * re-tokenization via [[encodeWord]] can differ once a later merge
    * creates an adjacency for an EARLIER-ranked pair; apply-time uses
    * greedy, train-time is sequential — the standard BPE asymmetry).
    *
    * 100 TB shape: ONE corpus scan builds the word-frequency vocab
    * (the only corpus-sized work — shuffle carries (word, partial
    * count), the classic word-count); every round then runs on the
    * vocab frame, which is corpus-SUBLINEAR (distinct words), so it is
    * `localCheckpoint`ed per round exactly per the pin rule — without
    * the pin, round k would replay all k-1 merge passes AND the corpus
    * scan. Each round's argmax collects ONE row to the driver (the
    * merges table is the bounded training artifact — the L103/L106
    * codebook precedent); the merge application is map-side column
    * algebra ([[applyMergeCol]]), no shuffle.
    *
    * Returns (rank, left, right, pairCount) in learned order; stops
    * early if no adjacent pair remains. */
  def trainMerges(docs: Dataset[(Long, String)],
                  nMerges: Int): Seq[(Int, String, String, Long)] = {
    val vocab0 = docs.toDF("doc_id", "text")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        expr("transform(sequence(0, length(word) - 1)," +
          " i -> substr(word, i + 1, 1))").as("seq"),
        col("freq"))
    var tok = vocab0.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val best = tok
        .where(size(col("seq")) >= 2)
        .select(explode(expr("transform(sequence(0, size(seq) - 2)," +
          " j -> struct(seq[j] AS l, seq[j + 1] AS r))")).as("p"),
          col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((k, l, r, cnt))
        tok = tok.select(applyMergeCol(col("seq"), l, r).as("seq"),
          col("freq")).localCheckpoint()
        k += 1
      }
    }
    out.toSeq
  }
}
