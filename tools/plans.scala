import graft.SparkEntry
import java.io.PrintWriter
val dir = "/root/testdata/sf0.01"
val names = Seq("q02_decode_join", "q07_tile_tumbling", "q24_exact_dedup",
  "q25_minhash_lsh", "q27_ngram_jaccard", "q28_cosine_topk", "q34_scene_pipeline", "q15_batches",
  "q40_ann_ivf",
  "q42_scene_source",
  "q47_dedup_clusters", "q48_stratified_sample", "q50_curate_corpus",
  "q57_bm25", "q58_hll_distinct", "q59_asof_join", "q60_lloyd_refine",
  "q61_chunk_windows", "q62_vocab_topk", "q63_rollup_stats",
  "q64_quantize_embed", "q65_json_extract", "q66_quantized_recall",
  "q67_frame_sample", "q68_funnel")
val pw = new PrintWriter("/tmp/plans_raw.txt")
for (name <- names) {
  pw.println(s"\n===== $name")
  val df = SparkEntry.queries(name)(spark, dir)
  pw.println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
}
pw.close()
System.exit(0)
