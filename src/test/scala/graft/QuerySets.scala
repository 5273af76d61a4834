package graft

/** Shared query classifications for the contract specs. */
object QuerySets {

  /** Queries whose BUILDER runs a side effect (a streaming drain with
    * checkpoint+sink I/O, or a parquet write) — constructing the
    * DataFrame is already the execution, so schema-only sweeps must
    * skip them (they are gated end-to-end by the driver instead). */
  val sideEffecting: Set[String] = Set(
    "q35_stream_ledger", "q71_stream_windows", "q72_stream_sessions",
    "q78_stream_dedup", "q87_stream_interval_join",
    "q104_stream_trajectories", "q112_stream_enrich", "q120_stream_tally",
    "q131_stream_serving", "q142_shard_sink", "q144_stream_outer_join",
    "q146_codebook_roundtrip", "q148_stream_full_outer_join",
    "q151_bpe_artifact", "q152_nc_scene_files", "q159_stream_dedup_wm",
    "q168_dedup_ledger", "q189_stream_frontier", "q190_recrawl_triage",
    "q198_sa_artifact")
}
