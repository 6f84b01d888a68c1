package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shuffle-budget fence: each pinned batch gate's physical plan carries
  * a MAXIMUM number of shuffle exchanges. Every `Exchange` is a full
  * network + disk round of the data — at 100 TB the difference between
  * 2 and 3 shuffles in a hot query is hours — so a future edit that
  * accidentally adds one (a lost bucketed layout, a dropped partial
  * aggregation, a join reorder that breaks co-partitioning) must fail
  * loudly by name, not surface as a silent slowdown in some later
  * round's bench.
  *
  * Budgets are pinned from the CURRENT audited plans (AQE off, broadcast
  * on auto — the static planner's shape; AQE can only merge/skip
  * exchanges at runtime, never add them), for EVERY batch gate — the
  * whole engine surface is fenced, not just the hot list. Re-measure
  * with `runMain graft.ExchangeAudit` after a planner-visible change and
  * re-pin deliberately. Streaming-harness gates are excluded (their
  * builders run a full streaming query; their specs + oracles pin them).
  */
class ExchangeBudgetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // fence the static plan
      .config("spark.ui.enabled", "false")
      .appName("exchange-budget-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // gate -> max shuffle exchanges in the static physical plan, pinned to
  // the EXACT measured counts of the current audited plans
  private val budgets: Seq[(String, Int)] = Seq(
    "q01_pricing_summary" -> 2,    // partial/final agg + output sort
    "q02_top_nation_revenue" -> 2, // joins all broadcast: agg + sort only
    "q03_latest_event_per_user" -> 2, // window partition + output sort
    "q04_country_sales_summary" -> 2,
    "q05_sliding_window_sales" -> 2,  // windowed agg + output sort
    "q06_enriched_segment_sales" -> 2,
    "q07_seed_transform" -> 0,     // map-side: bounded seed, no shuffle
    "q08_smt_pipeline" -> 1,
    "q09_seed_sql_shapes" -> 0,    // map-side CASE/interval rewrites
    "q10_scalar_subquery" -> 1,
    "q11_group_concat" -> 2,
    "q12_cdc_merge" -> 2,
    "q13_json_roundtrip" -> 2,
    "q14_dedup_exact" -> 2,        // digest groupBy reused by survivor agg
    "q15_dedup_bag" -> 2,
    "q16_neardup_lsh" -> 2,        // ONE band-build shuffle (r17 single-agg minhash) + output sort
    "q17_text_stats" -> 2,
    "q18_cosine_topk" -> 2,
    "q19_ann_lsh" -> 2,
    "q20_avro_roundtrip" -> 2,
    "q21_multimodal_meta" -> 1,
    "q22_partitioned_sink" -> 2,
    "q23_csv_roundtrip" -> 1,
    "q24_cdc_lake_upsert" -> 2,    // ONE global key shuffle folds base+log
    // one key-merge shuffle per pulled range + the presentation sort;
    // each pull reads ONLY its in-range delta commits (O(changes))
    "q124_cdc_incremental_pull" -> 3,
    // one key-merge shuffle per as-of snapshot + the presentation sort
    "q125_cdc_time_travel" -> 3,
    // the returned plan is the DOWNSTREAM table's q24-shaped _rt read;
    // the per-commit pulls execute during staging, outside this plan
    "q126_cdc_chained_pipeline" -> 2,
    "q25_country_sales_agg" -> 2,
    "q26_summary_topic" -> 2,
    "q27_simhash_neardup" -> 1,    // banded self-join broadcasts: one sort
    "q28_embedding_neardup" -> 1,
    "q29_winnow_fingerprint" -> 3,
    "q30_ann_multiprobe" -> 2,
    "q31_topk_native" -> 2,        // map-side-truncated top-k + output sort
    "q32_ann_ivf" -> 5,
    "q34_asof_enrich" -> 2,
    "q35_session_window" -> 2,
    "q36_kmv_distinct" -> 5,       // distinct + top-k + sketch/exact join
    "q37_hash_split" -> 2,
    "q38_pivot_events" -> 3,
    "q39_rollup_revenue" -> 2,
    "q40_dedup_clusters" -> 6,     // CC loop's final merged plan
    "q41_unpivot_events" -> 4,
    "q42_quantile_disc" -> 2,
    "q43_top_terms" -> 3,          // tf agg (df derives from checkpointed tf) + top-k + sort
    "q44_window_analytics" -> 2,
    "q45_user_setops" -> 6,        // three set ops, two shuffles each
    "q46_corpus_prep" -> 4,
    "q47_json_extract" -> 3,
    // measured plan: the corpus side broadcasts at fixture scale
    // (BroadcastHashJoin LeftAnti, no join shuffle), leaving the
    // keep-first groupBy + final orderBy exchanges; at a scale where
    // the corpus stops broadcasting, the anti-join adds its per-side
    // fingerprint shuffles — re-pin deliberately via ExchangeAudit
    "q73_incremental_dedup" -> 2,
    // ONE band-build agg (r17 single-agg minhash, ReuseExchange-shared
    // across its uses) + candidate distinct + rejected distinct + final
    // sort; the shingle join-backs and candidate sides broadcast at
    // fixture scale, and at 100 TB the corpus side is the bucketed
    // standing band index (BucketingSpec) — zero-exchange there
    "q75_incremental_neardup" -> 4,
    // admission keep-first window (fingerprint) + packing window
    // (split, source, shard — groupBy reuses it) + presentation sort;
    // the corpus anti-join broadcasts at fixture scale (bucketed
    // standing index at 100 TB — BucketingSpec)
    "q78_ingest_pack" -> 3,
    // window partition on (split, source, shard) + presentation sort;
    // the per-bin groupBy reuses the window's hash partitioning (its
    // keys are a superset of the window partition key)
    "q74_token_packing" -> 2,
    // two-phase distributed scan: range partition ×2 (run side +
    // offsets side, both over the checkpointed scalar frame) + the
    // local window's (run, source) hash + the kilobyte offsets frame's
    // agg/window + presentation sort; offsets rejoin is BROADCAST —
    // deliberately more static exchanges than a serial per-source
    // window (1) in exchange for no single-task funnel under a
    // dominant source (PrefixSum scaladoc)
    "q79_mixture_sample" -> 5,
    // bucket-collision probe join + rejected distinct + anti-join over
    // the checkpointed vector sketch; candidate sides broadcast at
    // fixture scale, bucketed standing index at 100 TB (q51 discipline)
    "q80_embedding_admission" -> 3,
    // band build aggs + split join-back + cross-split candidate join +
    // pair distinct + the two shingle fetch-backs + final sort over the
    // checkpointed shingle frame; candidate sides broadcast at fixture
    // scale, train side = the standing band index at 100 TB (q75's
    // bucketed discipline)
    "q81_decontamination" -> 5,
    // PrefixSum's two-phase scan over the checkpointed scalar quality
    // frame: range partition + (run, source) local window hash +
    // offsets agg + offsets window (kilobyte frame) + per-source counts
    // agg (broadcast-joined back) + presentation sort — the same
    // latency-for-skew trade as q79: a serial per-source row_number
    // window would be 2 exchanges but funnels a dominant source
    // through one task
    "q85_quality_gate" -> 6,
    // chunk-hash boilerplate agg + the semi join-back on h + per-doc
    // fold + presentation sort, over the checkpointed (doc_id, h)
    // chunk frame — digests shuffle, chunk bytes never do
    "q88_boilerplate_chunks" -> 4,
    // TWO q75-shaped admission rounds over the checkpointed shingle
    // frame (batch-2's round reads the folded standing index, so its
    // candidate branch fans over two bucketed segments); each round's
    // probe bands are checkpointed (admitByBandSegments), which is what
    // keeps the static count bounded — the (r17: single) band-build agg
    // is paid once for the whole staged table, not per join branch or
    // per round. The fold's own segment write
    // is outside the returned plan. Candidate sides broadcast at
    // fixture scale; index side is zero-exchange per segment at 100 TB
    // (BucketingSpec's maintained-index law)
    "q89_index_maintenance" -> 6,
    // q89's shape with a compact between fold and second admission —
    // the compact write is outside the returned plan, and batch 2
    // probes ONE merged segment instead of two, same static count
    "q93_compacted_maintenance" -> 6,
    // TWO q80-shaped admission rounds over the checkpointed vector
    // sketch (candidate/blocker sides broadcast at fixture scale, so
    // only the rejected distincts + final sorts shuffle; per-segment
    // zero-exchange on the index side at 100 TB — q80's bucketed law)
    "q90_vector_index_maintenance" -> 4,
    "q48_date_dims" -> 3,
    "q50_salted_enrich" -> 3,      // salt shuffle + join + de-salt agg
    "q51_bucketed_join" -> 2,      // the bucketed join itself adds ZERO
    "q53_bucket_pruned_lookup" -> 1,
    "q56_stratified_sample" -> 2,
    "q57_source_cap" -> 2)

  test("the fence is COMPLETE: every batch gate carries a pinned budget") {
    // without this, the 'whole surface is fenced' guarantee silently
    // decays — a new batch gate would simply not be measured
    val unfenced = SparkEntry.queries.keySet -- SparkEntry.streamingGates --
      budgets.map(_._1).toSet
    assert(unfenced.isEmpty,
      s"batch gates missing a shuffle budget (run graft.ExchangeAudit " +
        s"and pin them): ${unfenced.toSeq.sorted.mkString(", ")}")
    val stale = budgets.map(_._1).toSet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"budgets for unknown gates: $stale")
  }

  test("no pinned gate's static plan exceeds its shuffle budget") {
    val over = budgets.flatMap { case (name, budget) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val n = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }.size
      if (n > budget) Some(s"$name: $n exchanges > budget $budget") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }
}
