package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/**
 * Physical-plan hygiene: the properties that matter at 100 TB must be
 * visible in the plan, not assumed — filters reaching the parquet scan,
 * column pruning, broadcast of dimension tables, partial aggregation.
 * These assertions pin them against regressions.
 */
class PlanSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString
  }

  test("q04 anti-join: shipdate filter pushed to the parquet scan") {
    val p = planOf(RelationalOps.partsNeverOrdered(spark, dir))
    assert(p.contains("PushedFilters"), p.take(400))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q01 agg: scan pruned to the 4 referenced lineitem columns") {
    val p = planOf(RelationalOps.aggPricing(spark, dir))
    assert(p.contains("l_returnflag") && p.contains("l_quantity"))
    // untouched wide columns must not be read
    assert(!p.contains("l_shipdate") && !p.contains("l_partkey"), p)
    // map-side combine: a partial aggregate below the exchange
    assert(p.contains("partial_"), p)
  }

  test("q03 join: nation dim broadcast, not shuffled") {
    val p = planOf(RelationalOps.revenueByNation(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(600))
  }

  test("q13 jaccard: verifies LSH candidates — no source-key self-join, " +
       "no CartesianProduct") {
    val p = planOf(DedupOps.jaccardPairs(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    // the pair generator must be the banded LSH join, not an all-pairs
    // same-source join (r1's quadratic trap)
    assert(p.contains("band_hash"), p.take(600))
    assert(!p.contains("source"), p.take(600))
  }

  test("q31 IVF: cell is COMPUTED from the embedding — the label column " +
       "never appears in the plan, and no CartesianProduct") {
    val p = planOf(AnnOps.ivfTopK(spark, dir))
    assert(!p.contains("label"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("cell"), p.take(600))
  }

  test("q33 near-dup: banded signature join — no label join key, no " +
       "CartesianProduct, candidates join back to embeddings by id") {
    val p = planOf(AnnOps.embedNearDup(spark, dir))
    assert(!p.contains("label"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
    // the pair generator keys on the band signature
    assert(p.contains("band"), p.take(600))
  }

  test("q16 incremental LSH: corpus side never shuffles — batch bands " +
       "broadcast, band signatures a narrow per-row expression") {
    val p = planOf(DedupOps.incrLshCandidates(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    // the only hash-partitioned exchange carries candidate PAIRS (the
    // post-join distinct); corpus rows flow scan→map→broadcast-join
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges hash exchanges:\n${p.take(1200)}")
  }

  test("q17 incremental verify: candidates broadcast into the corpus " +
       "token scan — no CartesianProduct, no source-key join") {
    val p = planOf(DedupOps.incrJaccardVerify(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("band_hash"), p.take(800))
  }

  test("q35 incremental embedding candidates: corpus side never shuffles " +
       "— batch signatures broadcast, no label column") {
    val p = planOf(AnnOps.incrEmbedCandidates(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(!p.contains("label"), p.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges hash exchanges:\n${p.take(1200)}")
  }

  test("q36 multiprobe: probe fan-out stays on the query side — cell " +
       "equi-join, no label column, no CartesianProduct") {
    val p = planOf(AnnOps.ivfMultiprobeTopK(spark, dir))
    assert(!p.contains("label"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("cell"), p.take(600))
    // the corpus side carries ONE cell per row; only the query side
    // explodes (generator over the 1+CellBits probe array)
    assert("Generate explode".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q25 corpus-clean: single-scan feature computation with map-side " +
       "combine on the dedup group-by; no CartesianProduct") {
    val p = planOf(TextOps.corpusClean(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("partial_"), p.take(800))
    // untouched document columns must not be read
    assert(!p.contains("n_chars"), p.take(800))
  }

  test("q26 repetition: pure per-row scan — no exchange anywhere, scan " +
       "pruned to doc_id+text") {
    val p = planOf(TextOps.repetition(spark, dir))
    assert(!p.contains("Exchange"), p.take(800))
    assert(p.contains("doc_id") && p.contains("text"), p.take(400))
    assert(!p.contains("n_chars") && !p.contains("source"), p.take(800))
  }

  test("q52 BPE encode: after training, one no-shuffle codegen'd scan " +
       "pruned to doc_id+text — merges ride as literals, no join") {
    val p = planOf(TextOps.bpeEncode(spark, dir))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("doc_id") && p.contains("text"), p.take(400))
    assert(!p.contains("lang") && !p.contains("source"), p.take(800))
  }

  test("q37 k-means: trained centroids inline as literals — the final " +
       "assignment is a pure scan→project (no Exchange, no Join, no " +
       "SortAggregate; the argmin folds per-row under least())") {
    val p = planOf(AnnOps.kmeansCells(spark, dir))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("SortAggregate"), p.take(1200))
    assert(p.contains("least") && p.contains("sq_l2"), p.take(1200))
  }

  test("q38 trained-cell search: cell equi-join like q31 — no label, " +
       "no CartesianProduct") {
    val p = planOf(AnnOps.kmeansTopK(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("label"), p.take(800))
    assert(p.contains("cell"), p.take(400))
  }

  test("q41 ADC search: codebook and lookup table broadcast (the candidate " +
       "side ships codes only — no shuffle of the corpus embeddings), " +
       "argmin-style aggregation stays partial, no CartesianProduct") {
    val p = planOf(AnnOps.pqAdcTopK(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // both the assign (codes) and the score (LUT) joins are broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("partial_sum"), p.take(1200))
  }

  test("q27 decontaminate: benchmark gram set broadcast — the corpus side " +
       "streams through a map-side hash join, no corpus-wide shuffle for " +
       "the probe") {
    val p = planOf(CorpusOps.decontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q28 sample: scan pruned to the 3 referenced columns (no text)") {
    val p = planOf(CorpusOps.stratifiedSample(spark, dir))
    assert(!p.contains("n_chars"), p.take(800))
    assert(!p.contains("text:"), p.take(800))
  }

  test("q29 shards: window partitions by shard hash — per-shard sorts, " +
       "never a single-partition global ordering") {
    val p = planOf(CorpusOps.shuffleShards(spark, dir))
    assert(p.contains("hashpartitioning(shard"), p.take(1200))
    assert(!p.contains("SinglePartition"), p.take(1200))
    assert(!p.contains("rangepartitioning"), p.take(1200))
  }

  test("q42 token DF: vocabulary group-by combines map-side; the corpus " +
       "total is a 1-row broadcast, never a second shuffled scan") {
    val p = planOf(TextOps.tokenDf(spark, dir))
    assert(p.contains("partial_count"), p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin") ||
           p.contains("BroadcastExchange"), p.take(1200))
    // only `text` feeds the op — wide/unused doc columns stay unread
    assert(!p.contains("n_chars") && !p.contains("lang"), p.take(1200))
  }

  test("q43 rare ratio: rare vocabulary broadcast into the occurrence " +
       "stream — no SortMergeJoin on tok, no CartesianProduct, per-doc " +
       "rollup combines map-side") {
    val p = planOf(TextOps.rareTokenRatio(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("partial_"), p.take(1200))
  }

  test("q44 dup spans: every gram group/join key is the fixed-width hash " +
       "(raw gram text never shuffles), no CartesianProduct, group-bys " +
       "combine map-side") {
    val p = planOf(DedupOps.dupSpans(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("gh"), p.take(800))
    // dup-gram set = map-side-combined min/max (never distinct+count);
    // coverage = map-side collect_set of gram STARTS (never an 8×
    // position explode)
    assert(p.contains("partial_min"), p.take(1200))
    assert(p.contains("partial_collect_set"), p.take(1200))
    // the raw gram string is never a shuffle key: every hashpartitioning
    // clause keys on doc_id / gh / p, never a `gram` column
    assert(!"hashpartitioning\\([^)]*gram".r.findFirstIn(p).isDefined, p)
  }

  test("q46 as-of: NO join operator at all — one union, one shuffle on " +
       "user_id, carry-forward window; type filters pushed to the scan") {
    val p = planOf(TemporalOps.asofLastClick(spark, dir))
    assert(!p.contains("Join"), p.take(1200)) // matches every join variant
    assert(p.contains("Union"), p.take(1200))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("EqualTo(event_type,click)"), p)
  }

  test("q47 range join: bucketized to an equi-join — no " +
       "BroadcastNestedLoopJoin, no CartesianProduct, bin in the join keys") {
    val p = planOf(TemporalOps.rangeJoinCoverage(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("bin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q48 sessionize: one shuffle on user_id feeds both the window and " +
       "the rollup; the rollup combines map-side; scan pruned") {
    val p = planOf(TemporalOps.sessionize(spark, dir))
    assert(!p.contains("Join"), p.take(1200))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size <= 2, p)
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("props") && !p.contains("event_type"), p.take(1200))
  }

  test("q49 PII redact: pure per-row scan→map — no exchange anywhere, " +
       "scan pruned to doc_id+text") {
    val p = planOf(TextOps.piiRedact(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
    assert(!p.contains("n_chars") && !p.contains("lang"), p.take(1200))
  }

  test("q50 quantiles: NO per-source row-number sort over raw docs — the " +
       "cumulative window runs over the value-bounded histogram (a " +
       "map-side-combining aggregate below it); text never read") {
    val p = planOf(CorpusOps.lenQuantiles(spark, dir))
    // the r3 scale-killer: row_number over Window.partitionBy(source) put
    // an entire mega-source into one sort task
    assert(!p.contains("row_number"), p.take(1200))
    // histogram combines map-side before any exchange
    assert(p.contains("partial_count"), p.take(1200))
    // source shuffles: histogram group-by + window repartition, no third
    assert("hashpartitioning\\(source".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("text"), p.take(1200))
  }

  test("q54 tf-idf terms: idf vocabulary broadcast into the tf stream — " +
       "no SortMergeJoin on tok, no CartesianProduct, tf group-by " +
       "combines map-side, only text read") {
    val p = planOf(TextOps.tfidfTopTerms(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("n_chars") && !p.contains("lang"), p.take(1200))
  }

  test("q55 triangles: every join is a key-partitioned equi-join — no " +
       "CartesianProduct, no BroadcastNestedLoopJoin; per-node rollup " +
       "combines map-side") {
    val p = planOf(GraphOps.triangles(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
    // only doc_id feeds the graph — text/lang never read
    assert(!p.contains("text") && !p.contains("lang"), p.take(1200))
  }

  test("q58 mixture rebalance: the rate table broadcasts back into a " +
       "pure per-row scan — no SortMergeJoin, no corpus shuffle for the " +
       "keep decision") {
    val p = planOf(CorpusOps.mixtureRebalance(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the corpus side reaches the join straight from the scan: the only
    // hashpartitioning exchange is the tiny lang-count aggregate's
    assert("hashpartitioning\\(lang".r.findAllIn(p).size <= 1, p)
    assert(!"hashpartitioning\\(doc_id".r.findFirstIn(p).isDefined, p)
  }

  test("q59 source quota: the slot<=20 rank filter pushes down as " +
       "WindowGroupLimit — map tasks pre-prune to local top-20 before " +
       "the shuffle") {
    val p = planOf(CorpusOps.sourceQuota(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("text"), p.take(1200)) // scan pruned
  }

  test("q60 KMV sketch: the k-min selection prunes pre-shuffle via " +
       "WindowGroupLimit; no CartesianProduct; distinct aggregates " +
       "combine map-side") {
    val p = planOf(CorpusOps.kmvDistinct(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("partial_"), p.take(1200))
  }

  test("q61 CMS heavy hitters: top-20 is a TakeOrdered (no global sort), " +
       "the sketch broadcasts into the probes, aggregates combine " +
       "map-side") {
    val p = planOf(TextOps.cmsHeavyHitters(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("rangepartitioning"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q62 seq packing: ONE shard exchange feeds both the offset window " +
       "and the rollup; no global ordering anywhere") {
    val p = planOf(CorpusOps.seqPacking(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
    assert(p.contains("partial_"), p.take(1500))
  }

  test("q63 bigram lift: unigram table + 1-row total broadcast into the " +
       "bigram stream — no SortMergeJoin, no CartesianProduct; top-20 is " +
       "a TakeOrdered") {
    val p = planOf(TextOps.bigramLift(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q64 semantic dedup: candidates scoped to the trained cell " +
       "equi-join — no label, no CartesianProduct; the dup-id set " +
       "broadcasts back for the kept flag") {
    val p = planOf(AnnOps.semanticDedup(spark, dir))
    assert(!p.contains("label"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("cell"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q65 LM surprise: the bigram/unigram model tables broadcast into " +
       "the occurrence stream (ship-the-LM shape) — no SortMergeJoin, no " +
       "rangepartitioning; per-doc rollup combines map-side") {
    val p = planOf(TextOps.lmSurprise(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q66 DSIR weights: the 64-row models inline as array literals " +
       "(bounded-model collect, q37's pattern) — no model join at all, " +
       "no SortMergeJoin, no rangepartitioning; rollups combine map-side") {
    val p = planOf(CorpusOps.dsirWeights(spark, dir))
    assert(!p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("element_at"), p.take(1500))
  }

  test("q68 fuzzy decontamination: benchmark gram table and size table " +
       "broadcast into the corpus stream (q27's shape) — no SortMergeJoin," +
       " no CartesianProduct; the pair rollup combines map-side") {
    val p = planOf(CorpusOps.fuzzyDecontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q69 budget selection: no corpus-keyed shuffle at all — the " +
       "histogram is score-bounded, the cutoff rides a broadcast back; " +
       "no SortMergeJoin, no rangepartitioning, no doc_id exchange") {
    val p = planOf(CorpusOps.budgetSelect(spark, dir))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
    assert(!p.matches("(?s).*hashpartitioning\\(doc_id.*"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q67 exact scrub: gram keys stay hashed, covered positions " +
       "collapse to one array row per doc before the rebuild join " +
       "(doc-keyed, never token-level), no CartesianProduct") {
    val p = planOf(DedupOps.exactScrub(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the collect_set rollup combines map-side (ObjectHashAggregate pair)
    assert(p.contains("partial_collect_set"), p.take(1500))
    // raw gram text never appears as a join/group key: every gram key is
    // the md5 hex (fixed width) — same invariant as q44
    assert(!p.matches("(?s).*hashpartitioning\\(toks.*"), p.take(1500))
  }

  test("q70 BM25: corpus never explodes into tokens — the tf is a " +
       "per-row array expression; stats broadcast back; the top-10 rank " +
       "filter lowers to WindowGroupLimit; no SortMergeJoin") {
    val p = planOf(SearchOps.bm25TopK(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the only Generates are the 3-term query fan-out (the subtree shows
    // up twice: the df-stats pass and the scoring pass — BM25's standard
    // two scans); the corpus token array is NEVER exploded
    assert(!p.contains("explode(split("), p.take(1500))
    val generates = "Generate explode".r.findAllIn(p).size
    assert(generates <= 2, s"$generates Generates:\n${p.take(1500)}")
  }

  test("q71 random projection: pure scan→project — ZERO exchanges; the " +
       "whole op is one codegen'd map stage") {
    val p = planOf(AnnOps.randProj(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
    assert(p.contains("*(1)"), p.take(400))
  }

  test("q72 MinHash audit: candidate-fed equi-joins only — no " +
       "CartesianProduct, no source/label key; family match is a " +
       "per-row zip_with, not a signature shuffle") {
    val p = planOf(DedupOps.minhashAudit(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("band_hash"), p.take(1500))
  }

  test("q73 postings: head cap lowers to WindowGroupLimit — map tasks " +
       "pre-prune to local top-8 per term before the shuffle; stats " +
       "combine map-side") {
    val p = planOf(SearchOps.postings(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q74 chunking: pure narrow scan→generate→project — ZERO exchanges") {
    val p = planOf(CorpusOps.docChunks(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
  }

  test("q75 dim stats: first pass shuffles only 64 dim keys with " +
       "map-side combine; the 64-row stat table broadcasts back — no " +
       "SortMergeJoin") {
    val p = planOf(AnnOps.dimStats(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q76 incremental vocab: the batch term set broadcasts as a LEFT " +
       "SEMI into the corpus token stream — the corpus aggregates only " +
       "touched vocabulary; no CartesianProduct") {
    val p = planOf(TextOps.incrVocab(spark, dir))
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q77 source KL: (source × lang)-bounded aggregates with the corpus " +
       "distribution broadcast back — no SortMergeJoin, map-side combine") {
    val p = planOf(CorpusOps.sourceKl(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q78 copy matrix: candidate-bounded equi-joins, no CartesianProduct; " +
       "the matrix rollup combines map-side") {
    val p = planOf(DedupOps.copyMatrix(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("band_hash"), p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(1500))
  }

  test("q79 bucket balance: ONE corpus aggregate (map-side combined), " +
       "totals broadcast back into the 32-row rollup") {
    val p = planOf(CorpusOps.bucketBalance(spark, dir))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q80 winnowing: one narrow per-row expression chain — ZERO " +
       "exchanges, no explode") {
    val p = planOf(DedupOps.winnowing(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
    assert(!p.contains("Generate"), p.take(1200))
  }

  test("q81 signal agreement: the only corpus-keyed shuffle is the " +
       "doc_id signal join; the 4×3 rollup combines map-side; model " +
       "tables stay broadcast") {
    val p = planOf(TextOps.signalAgreement(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q82 split leakage: candidate-bounded equi-joins only — no " +
       "CartesianProduct; the <=9-cell matrix combines map-side") {
    val p = planOf(CorpusOps.splitLeakage(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("band_hash"), p.take(1500))
  }

  test("q83 span mask: one narrow per-row expression chain — ZERO " +
       "exchanges, no explode") {
    val p = planOf(TextOps.spanMask(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
    assert(!p.contains("Generate"), p.take(1200))
  }

  test("q84 max spans: run merge happens INSIDE one row per doc — gram " +
       "keys stay hashed, coverage collapses via map-side collect_set, " +
       "no window/sort operator over doc rows, no CartesianProduct") {
    val p = planOf(DedupOps.dupMaxSpans(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_collect_set"), p.take(1500))
    // the oracle's gaps-and-islands spelling would need row_number over
    // (doc, position) rows — the engine must never pay that sort
    assert(!p.contains("row_number"), p.take(1500))
    assert(!p.matches("(?s).*hashpartitioning\\(toks.*"), p.take(1500))
  }

  test("q85 long-span scrub: same plan discipline as q84 — hashed gram " +
       "keys, map-side collect_set coverage, per-row threshold + scrub, " +
       "no window/row_number, no CartesianProduct") {
    val p = planOf(DedupOps.longSpanScrub(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_collect_set"), p.take(1500))
    assert(!p.contains("row_number"), p.take(1500))
    // the scrub must not explode tokens back out for a positional join —
    // q67's per-row filter idiom, with the span list instead of the
    // position set
    assert(!p.matches("(?s).*hashpartitioning\\(toks.*"), p.take(1500))
  }

  test("q40 features: construct→decode→extract is a pure per-row " +
       "scan→map chain — ZERO exchanges") {
    val p = planOf(MultimodalOps.mmFeatures(spark, dir))
    assert(!p.contains("Exchange"), p.take(1200))
  }

  test("whole-stage codegen covers the scan+filter+project pipelines") {
    // `*(n)` prefixes mark WholeStageCodegen spans in the plan string
    // (shuffling plans sit under an unfinalized AdaptiveSparkPlan wrapper
    // pre-execution, which hides the markers — the exchange-free pipeline
    // is the clean probe; q01's map-side combine is asserted above)
    val p = planOf(TextOps.qualityScore(spark, dir))
    assert(p.contains("*(1)"), p.take(400))
  }
}
