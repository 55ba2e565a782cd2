package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Training-data pipeline assembly operators (builder brief: "the
  * operations a large-scale training-data pipeline would need"): the
  * steps between a cleaned corpus and model-ready batches — packing
  * documents into fixed token budgets, deterministic stratified
  * sampling for corpus mixtures, and embedding quantization for
  * ANN-index compression. The reference hands records to an opaque
  * `Handler` (kinesis.go:100-105); these are the batch halves of what
  * such a handler feeds.
  *
  * All three are single-scan, shuffle-minimal shapes: packing is one
  * window per stratum (no global order — see [[packSequences]]),
  * sampling is a pure codegen'd filter (zero shuffles), quantization
  * is a per-row map (zero shuffles). Linear and partition-parallel at
  * 100 TB.
  */
object Pipeline {

  private val WS = "\\s+"

  /** Token-budget sequence packing: assign each document to a training
    * "pack" (bin) of at most ~`budget` tokens, PER STRATUM. The
    * concatenated token stream of each stratum (in `idCol` order) is
    * chunked at budget boundaries; a document lands in the bin where
    * its first token falls — the deterministic streaming pack used to
    * build fixed-length training sequences.
    *
    * Packing is inherently sequential, so a GLOBAL pack would be a
    * single-partition window — the 100 TB shape is exactly this one:
    * partition by a stratum key (source shard / language / date), pack
    * within each stratum in parallel, one exchange+sort total. Bins of
    * different strata are independent, which is what a training
    * pipeline wants anyway (packs never mix languages/sources).
    *
    * Output: (id, stratum, n_toks, cum_toks, bin) — `bin` is the
    * 0-based pack number within the stratum, `cum_toks` the running
    * token count through this document.
    */
  def packSequences(docs: DataFrame, budget: Int, strataCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_toks", size(split(trim(col(textCol)), WS)))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      // integer `div`, not floating floor(/): exact at any magnitude
      .withColumn("bin", expr(s"(cum_toks - n_toks) div $budget"))
      .select(col(idCol), col(strataCol), col("n_toks"), col("cum_toks"), col("bin"))
  }

  /** Deterministic content-hash stratified sampling: keep a document
    * iff the first 4 hex digits of md5(text) fall below the stratum's
    * threshold — `rates` maps stratum value → sampling fraction in
    * 65536ths (e.g. 16384 = 25%). Strata absent from the map get
    * `defaultRate`.
    *
    * Content-hash (not id-hash) sampling means byte-identical
    * duplicates are kept or dropped TOGETHER — re-running after an
    * upstream re-shuffle, or on a different engine, selects the same
    * sample (md5 is engine-independent; the DuckDB oracle recomputes
    * it). This is how corpus mixtures are downweighted (e.g. web crawl
    * at 25%, books at 100%) without materializing a random state.
    *
    * A pure codegen'd scan+filter: no shuffle, no RNG, trivially
    * partition-parallel — the cheapest possible 100 TB shape.
    *
    * Output: the sampled rows' (id, stratum, bucket) with `bucket` the
    * 4-hex-digit hash prefix the decision was made on.
    */
  def sampleStratified(docs: DataFrame, rates: Map[String, Int],
      defaultRate: Int, strataCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(defaultRate >= 0 && defaultRate <= 65536, s"defaultRate out of range: $defaultRate")
    rates.values.foreach(r => require(r >= 0 && r <= 65536, s"rate out of range: $r"))
    // threshold as zero-padded 4-hex; 65536 (keep-all) needs a string
    // ABOVE every 4-hex bucket — "10000" would compare lexicographically
    // BELOW "ffff" ('1' < 'f') and keep almost nothing.
    def hex4(r: Int): String = if (r >= 65536) "g" else f"$r%04x"
    val thr = rates.foldLeft(lit(hex4(defaultRate))) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(hex4(r))).otherwise(acc)
    }
    docs
      .withColumn("bucket", substring(md5(col(textCol)), 1, 4))
      .filter(col("bucket") < thr)
      .select(col(idCol), col(strataCol), col("bucket"))
  }

  /** Deterministic train/val/test split assignment by content hash:
    * split boundaries are md5-prefix thresholds (fractions in 65536ths,
    * like [[sampleStratified]]), so the assignment is reproducible
    * across engines/re-runs with no RNG state, and byte-identical
    * duplicate documents ALWAYS land in the same split — exact-dup
    * train/test leakage is impossible by construction. A pure
    * codegen'd per-row map; zero shuffles at any corpus size.
    *
    * Output: every input row's (id, bucket, split) with split ∈
    * {"test", "val", "train"}: bucket < testRate → test, < testRate +
    * valRate → val, else train.
    */
  def splitAssign(docs: DataFrame, testRate: Int, valRate: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(testRate >= 0 && valRate >= 0 && testRate + valRate <= 65536,
      s"rates out of range: test=$testRate val=$valRate")
    def hex4(r: Int): String = if (r >= 65536) "g" else f"$r%04x"
    docs
      .withColumn("bucket", substring(md5(col(textCol)), 1, 4))
      .withColumn("split",
        when(col("bucket") < hex4(testRate), "test")
          .when(col("bucket") < hex4(testRate + valRate), "val")
          .otherwise("train"))
      .select(col(idCol), col("bucket"), col("split"))
  }

  /** Per-vector int8 scalar quantization of an embedding column — the
    * standard ANN-index compression (4× smaller than float32): each
    * vector is mapped to 256 levels over its own [min, max] range, so
    * no global statistics pass is needed and the operator is a pure
    * per-row map (zero shuffles, embarrassingly parallel at 100 TB).
    *
    * Quantized value: q = min(255, floor((x − mn) · 255 / (mx − mn)))
    * computed in float64 — bitwise-reproducible across engines (the
    * DuckDB oracle recomputes it exactly; see oracle-parity notes).
    * Degenerate constant vectors (mx = mn) quantize to 0.
    *
    * Output is LONG FORM — one row per (vec_id, dim) with the level
    * `q` and the vector's (mn, mx) dequantization range — because the
    * correctness gate hashes scalar columns; the array-form packer is
    * a trivial `groupBy(vec_id).agg(collect_list)` away.
    */
  def quantizeEmbeddings(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb
      .select(col(idCol).as("vec_id"),
        // min/max over the raw float array, cast after: float→double is
        // exact and monotone so cast∘min = min∘cast, and this keeps the
        // pre-explode projection HOF-free (array_min/max are codegen'd).
        col(vecCol).as("e"),
        array_min(col(vecCol)).cast("double").as("mn"),
        array_max(col(vecCol)).cast("double").as("mx"))
      // posexplode the RAW array (never explode over a lambda-HOF array:
      // the lambda re-evaluates per emitted row) and cast per element.
      .select(col("vec_id"), col("mn"), col("mx"),
        posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255L),
            floor((col("x").cast("double") - col("mn")) * 255 / (col("mx") - col("mn")))))
          .as("q"),
        col("mn"), col("mx"))

  /** Deterministic training-order shuffle: assign each document to one
    * of `nShards` output shards and give it a reproducible position
    * within its shard — the "global shuffle" a training pipeline needs
    * before writing batch files, WITHOUT an RNG: both decisions derive
    * from md5(text), so re-runs, other engines, and upstream
    * repartitions produce byte-identical shard files.
    *
    * Shard = equal-width range over the first 4 hex digits of the hash
    * (bucket·nShards div 65536 — uniform because md5 is); the
    * within-shard key is the NEXT 12 hex digits, independent of the
    * bits that chose the shard, with `idCol` as the collision tbreak.
    * One exchange (hash by shard) + per-shard sort — exactly the write
    * pattern of a sharded training-data job at any scale; shards are
    * equal-sized in expectation, so no straggler task.
    *
    * Output: (id, shard, ord, rnk) — `rnk` the document's 1-based
    * training position within its shard.
    *
    * `epoch` re-seeds the hash (text salted with "#epoch"), giving
    * each training epoch an INDEPENDENT deterministic order — the
    * between-epoch reshuffle a training loop needs, still with no RNG
    * state to store and still engine-reproducible. Epoch 0 hashes the
    * bare text (byte-identical to the pre-epoch behavior).
    */
  def shuffleShard(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id", textCol: String = "text",
      epoch: Int = 0): DataFrame = {
    require(nShards > 0 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val seed = if (epoch == 0) col(textCol)
      else concat(col(textCol), lit(s"#$epoch"))
    val w = Window.partitionBy("shard").orderBy(col("ord"), col(idCol))
    docs
      .withColumn("__ss_h", md5(seed))
      // integer `div` (exact at any magnitude), as in [[packSequences]]
      .withColumn("shard",
        expr(s"CAST(conv(substring(__ss_h, 1, 4), 16, 10) AS BIGINT) " +
          s"* $nShards div 65536").cast("int"))
      .withColumn("ord", substring(col("__ss_h"), 5, 12))
      .withColumn("rnk", row_number().over(w))
      .select(col(idCol), col("shard"), col("ord"), col("rnk"))
  }

  /** Corpus-mixture sampling to TARGET PROPORTIONS: `weights` gives the
    * desired composition of the output (e.g. en:2, de:1, fr:1 → half
    * the output English); strata absent from the map are dropped. The
    * operator solves for the largest output achievable WITHOUT
    * upsampling — T = min over strata of n_s/w_s "docs per unit
    * weight" — and keeps each stratum at rate w_s·T/n_s via the same
    * content-hash thresholds as [[sampleStratified]] (the binding
    * stratum keeps everything; rate 1 is exact when w_s·T = n_s).
    *
    * By default the stratum counts come from an extra aggregate pass
    * over `docs` — i.e. the corpus is READ TWICE (once for counts,
    * once for the filtered output). At 100 TB pass `stratumCounts`
    * instead: an ingest-time stats table of (`strataCol`, `n`) rows —
    * the same pattern as q36's hot-key stats — which makes the
    * operator a single corpus scan with a broadcast of |strata|
    * thresholds, never shuffled. Content-hash selection keeps
    * byte-identical duplicates together and makes the sample
    * engine-reproducible, like every sampler in this file.
    *
    * A weighted stratum with NO corpus rows makes the requested
    * mixture unsatisfiable at any size (T would be 0); that fails at
    * execution with a clear error rather than silently returning a
    * wrong mixture. (If NO weighted stratum is present the result is
    * empty — T = 0 honored literally.)
    *
    * Output: the kept rows' (id, stratum, bucket).
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      strataCol: String, idCol: String = "doc_id",
      textCol: String = "text",
      stratumCounts: Option[DataFrame] = None): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    weights.foreach { case (k, v) =>
      require(v > 0, s"weight for $k must be positive, got $v") }
    val wcol = weights.foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val counts = stratumCounts match {
      case Some(stats) => stats
        .select(col(strataCol).as("__stratum"), wcol.as("__w"),
          col("n").cast("long").as("__n"))
        .filter(col("__w").isNotNull)
      case None => docs.select(col(strataCol).as("__stratum"), wcol.as("__w"))
        .filter(col("__w").isNotNull)
        .groupBy("__stratum", "__w").agg(count(lit(1)).as("__n"))
    }
    val minCap = counts.agg(
      min(col("__n").cast("double") / col("__w")).as("__t"),
      count(lit(1)).as("__k"))
    // threshold per stratum as a zero-padded 4-hex string; rate 1 (the
    // binding stratum) floors to 65536 → "g", above every hex bucket.
    // A missing weighted stratum (fewer count rows than weights) means
    // T=0 — unsatisfiable — surfaced as an execution-time error.
    val thr = counts.crossJoin(broadcast(minCap))
      .withColumn("__rate16",
        when(col("__k") < weights.size,
          raise_error(concat(lit("mixtureSample: only "), col("__k"),
            lit(s" of ${weights.size} weighted strata present in the corpus; " +
              "the requested mixture is unsatisfiable without upsampling"))))
          .otherwise(
            floor(col("__w") * col("__t") / col("__n").cast("double") * 65536)
              .cast("long")))
      .select(col("__stratum"),
        when(col("__rate16") >= 65536, lit("g"))
          .otherwise(lpad(lower(hex(col("__rate16"))), 4, "0")).as("__thr"))
    docs
      .withColumn("bucket", substring(md5(col(textCol)), 1, 4))
      .join(broadcast(thr), col(strataCol) === col("__stratum"))
      .filter(col("bucket") < col("__thr"))
      .select(col(idCol), col(strataCol), col("bucket"))
  }

  /** Heuristic quality-filter chain (the C4/Gopher-style rule screen
    * that precedes dedup in a training pipeline): per-document token
    * statistics scored against configurable rules, each rule surfaced
    * as its own column so a pipeline can audit WHY a document was
    * dropped, plus the combined `keep` verdict.
    *
    * Rules: token count within [minToks, maxToks]; vocabulary ratio
    * (distinct/total tokens) >= minVocabRatio (gibberish screen);
    * top-token fraction <= maxTopFrac (repetition screen); mean token
    * length within [minMeanLen, maxMeanLen] (symbol-soup screen);
    * contains at least one stopword (language-integrity screen, the
    * C4 heuristic).
    *
    * Two map-side-combinable aggregates — (doc, token) counts, then
    * per-doc stats — i.e. one shuffle family on doc_id; ratios are
    * IEEE divisions of exact integers (engine-reproducible). Linear
    * and partition-parallel at any corpus size.
    */
  def qualityFilter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minToks: Long = 20, maxToks: Long = 1000,
      minVocabRatio: Double = 0.2, maxTopFrac: Double = 0.2,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")): DataFrame = {
    val perTok = docs
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), WS)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    perTok.groupBy("doc_id").agg(
        sum("c").as("n_toks"),
        count(lit(1)).as("n_vocab"),
        max("c").as("top_cnt"),
        sum(length(col("tok")) * col("c")).as("n_tok_chars"),
        max(when(col("tok").isin(stopwords: _*), 1L).otherwise(0L)).as("has_stop"))
      .withColumn("vocab_ratio", col("n_vocab") / col("n_toks"))
      .withColumn("top_frac", col("top_cnt") / col("n_toks"))
      .withColumn("mean_tok_len", col("n_tok_chars") / col("n_toks"))
      .withColumn("keep",
        col("n_toks").between(minToks, maxToks) &&
          col("vocab_ratio") >= minVocabRatio &&
          col("top_frac") <= maxTopFrac &&
          col("mean_tok_len").between(minMeanLen, maxMeanLen) &&
          col("has_stop") === 1L)
      .select("doc_id", "n_toks", "vocab_ratio", "top_frac", "mean_tok_len",
        "has_stop", "keep")
  }

  /** Exact-k deterministic per-stratum sample: the `k` documents with
    * the SMALLEST content hash in each stratum (all of them if the
    * stratum has fewer than `k`). Like [[sampleStratified]] it is
    * RNG-free and engine-reproducible — same corpus, same k rows,
    * every run, any engine — but it guarantees an exact count instead
    * of a binomial one (eval sets, few-shot pools, and per-domain
    * audit samples need exactly k).
    *
    * Naively this is a row_number window per stratum — which SORTS THE
    * WHOLE STRATUM per task, the q39 one-partition-window shape that
    * dies at 100 TB. Instead, two phases: per-stratum counts (one tiny
    * aggregate, broadcast back) set a hash-prefix threshold of
    * `margin`×k expected survivors; the corpus is then prefiltered by
    * that threshold IN THE SCAN (codegen, no shuffle), and only the
    * ~margin×k survivors per stratum are window-ranked. Because the
    * prefix threshold is a clean prefix of the sort key, survivors are
    * EXACTLY the global smallest-m hashes of each stratum — so the
    * result equals the naive form, verified row-for-row by the gate's
    * naive-form DuckDB oracle. If a freak hash distribution leaves a
    * stratum with fewer than min(k, n) survivors, the operator raises
    * (deterministically, per dataset) rather than return a short
    * sample — bump `margin`.
    *
    * Output: (id, stratum, rk) with rk ∈ [1, k], ordered by hash —
    * dup texts rank adjacently (same hash, id tie-break).
    */
  def exactKSample(docs: DataFrame, k: Int, strataCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      margin: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(margin >= 1, s"margin must be >= 1, got $margin")
    val hashed = docs
      .withColumn("__h", md5(col(textCol)))
      .withColumn("__h16", conv(substring(col("__h"), 1, 4), 16, 10).cast("long"))
    val counts = hashed.groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__thr16", least(lit(65536L),
        ceil(lit(margin.toLong * k) * lit(65536.0) /
          col("__n").cast("double")).cast("long")))
    val w = Window.partitionBy(strataCol).orderBy(col("__h"), col(idCol))
    val ws = Window.partitionBy(strataCol)
    hashed
      .join(broadcast(counts), col(strataCol) === col("__stratum"))
      .filter(col("__h16") < col("__thr16"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(ws))
      .filter(when(col("__m") < least(lit(k.toLong), col("__n")),
          raise_error(concat(lit("exactKSample: stratum "), col(strataCol),
            lit(s" prefilter undersampled (margin=$margin too small): kept "),
            col("__m"), lit(" of "), col("__n"), lit(s" rows, need $k"))))
        .otherwise(lit(true)))
      .filter(col("rk") <= k)
      .select(col(idCol), col(strataCol), col("rk"))
  }

  /** Weighted priority sampling without replacement: draw `k` rows
    * with inclusion preference proportional to `weightCol`, RNG-free.
    * Each row gets a priority `h / w` where `h` is a uniform 32-bit
    * integer from md5 of the content (the A-Res/priority-sampling key
    * with the uniform draw replaced by a deterministic content hash —
    * Efraimidis–Spirakis, Inf. Proc. Letters 2006, with u^(1/w)
    * monotonically replaced by h/w on a fixed grid); the k SMALLEST
    * priorities win, so doubling a row's weight halves its expected
    * key. Re-runs, other engines, and upstream repartitions reproduce
    * the same sample byte-for-byte.
    *
    * Scale shape: the priority is a per-row codegen'd map and the
    * selection is `orderBy(priority).limit(k)` — Catalyst plans
    * TakeOrderedAndProject (per-partition top-k, single driver merge
    * of k·partitions rows), NEVER a global sort. At 100 TB this is
    * one scan, zero shuffles, k rows moved.
    *
    * Cross-engine exactness: `h` and `w` are exact longs and the
    * priority is ONE IEEE division — bit-identical in any engine.
    * Rows with non-positive weight are excluded (can't be drawn).
    *
    * Output: (id, weight, priority), the k winners.
    */
  def weightedPrioritySample(docs: DataFrame, k: Int,
      weightCol: String = "n_chars", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs
      .filter(col(weightCol) > 0)
      .withColumn("__h",
        conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long"))
      .withColumn("priority",
        col("__h").cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol), col("priority"))
  }

  // Registered queries: the public operators applied to the driver's
  // test tables, plus the gate's total-order sort.
  /** Length-bucketed batch assignment: documents are grouped into
    * training batches of `batchSize` docs with SIMILAR token counts
    * (bucket = n_toks div `bucketWidth`), the standard padding-waste
    * reducer — a batch pads every member to its max length, so batching
    * like-sized docs together is almost free throughput. Assignment is
    * deterministic and RNG-free: within each (bucket, shard) the docs
    * are numbered by id and chunked, so re-runs reproduce byte-equal
    * batches (resumable training, like [[shuffleShard]]).
    *
    * The `shards` dimension exists for scale: token-length buckets are
    * FEW (len div width), and a window partitioned only by bucket
    * would sort 1/buckets of a 100 TB corpus per task — the q39 OOM
    * shape. The content-hash shard splits every bucket `shards` ways,
    * so partition count scales with the cluster, not the length
    * distribution.
    *
    * Output: (id, n_toks, bucket, shard, batch) — one row per doc.
    */
  def lengthBucketBatches(docs: DataFrame, batchSize: Int = 8,
      bucketWidth: Int = 16, shards: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(shards >= 1 && shards <= 65536,
      s"shards must be in [1, 65536], got $shards")
    val w = Window.partitionBy("bucket", "shard").orderBy(col(idCol))
    docs
      .withColumn("n_toks", size(split(trim(col(textCol)), "\\s+")))
      .withColumn("bucket", expr(s"n_toks div $bucketWidth").cast("int"))
      .withColumn("__h4",
        conv(substring(md5(col(textCol)), 1, 4), 16, 10).cast("long"))
      .withColumn("shard", expr(s"__h4 * $shards div 65536").cast("int"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"(__rn - 1) div $batchSize").cast("int"))
      .select(col(idCol), col("n_toks"), col("bucket"), col("shard"),
        col("batch"))
  }

  /** Single-pass column profiling (the Deequ/"data quality report"
    * shape): per column — row count, null count, distinct count,
    * min/max (stringified AFTER aggregating in the column's native
    * type, so numeric ordering is preserved). Output is long format,
    * one row per profiled column — the shape a quality dashboard or a
    * schema-drift monitor joins against.
    *
    * Scale: everything is ONE aggregate over one scan. With
    * `approxNdv = true` (the 100 TB default) distinct counts are HLL
    * sketches (`approx_count_distinct`) and the plan is a plain
    * partial+final hash aggregate — no Expand, no second scan, state
    * is O(cols). With exact NDV (the oracle-checkable path used by the
    * gate) Spark rewrites the multi-column COUNT(DISTINCT) through one
    * Expand — still one scan, but the shuffle carries cols× the rows;
    * fine at audit cadence, wrong as an always-on monitor. Both plans
    * are pinned in PlanShapeSpec.
    */
  def profile(df: DataFrame, cols: Seq[String],
      approxNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        val ndv =
          if (approxNdv) approx_count_distinct(col(c))
          else countDistinct(col(c))
        Seq(
          count(col(c)).as(s"__nn_$c"),
          ndv.as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__mn_$c"),
          max(col(c)).cast("string").as(s"__mx_$c"))
      }
    val a = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', n_rows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    a.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs)")
          .as(Seq("col_name", "n_nulls", "n_distinct", "min_val", "max_val")))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Fixed-size overlapping passage chunks — the retrieval/long-doc
    * training shape (context-window packing's upstream step): each
    * document's whitespace token stream (t01's tokenization) splits
    * into `chunkSize`-token chunks starting every `chunkSize−overlap`
    * tokens, the trailing chunk keeping whatever remains. Provenance
    * survives: (doc_id, chunk_idx, start_tok) addresses every chunk
    * back to its source span — what a dedup-then-retrain or citation
    * pipeline needs.
    *
    * Scale: ONE scan, zero joins/shuffles — tokenize, a chunk-count
    * column, explode a 0..nc−1 sequence, in-row `slice`+`array_join`.
    * Output size is the explode fan-out (≈ n/stride rows per doc),
    * each row carrying only its own chunk text. Deterministic, so the
    * oracle rebuilds every chunk string exactly.
    */
  def chunkOverlap(docs: DataFrame, chunkSize: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // 1 chunk when the doc fits; else one start every `stride` tokens
      // until the tail fits in the last chunk
      .withColumn("__nc",
        when(col("__n") <= chunkSize, lit(1)).otherwise(
          lit(1) + ceil((col("__n") - chunkSize).cast("double") / stride)
            .cast("int")))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(chunkSize), col("__n") - col("chunk_idx") * stride)
          .as("chunk_tokens"),
        array_join(slice(col("__toks"),
          col("chunk_idx") * lit(stride) + lit(1), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pack each language's documents into 512-token training bins.
    "p01_pack_sequences" -> ((s, dir) =>
      packSequences(documents(s, dir), budget = 512, strataCol = "lang")
        .orderBy("doc_id")),

    // Corpus mixture: downweight the (majority) English stratum to 25%,
    // sample the rest at 50% — deterministic, content-hash-based.
    // p02/p04 sort the RAW scan and filter/project after (r16, same
    // note as TextOps.queries): the trailing orderBy's range-bounds
    // sampling otherwise executes the md5 screen twice. Row-wise ops,
    // unique doc_id: identical rows and order.
    "p02_sample_stratified" -> ((s, dir) =>
      sampleStratified(documents(s, dir).orderBy("doc_id"),
        rates = Map("en" -> 16384),
        defaultRate = 32768, strataCol = "lang")),

    "p03_quantize_embeddings" -> ((s, dir) =>
      quantizeEmbeddings(embeddings(s, dir))
        .orderBy("vec_id", "dim")),

    // 5% test / 5% val / 90% train, content-hash assigned.
    "p04_split_assign" -> ((s, dir) =>
      splitAssign(documents(s, dir).orderBy("doc_id"),
        testRate = 3277, valRate = 3277)),

    // Rule screen over the synthetic corpus; thresholds chosen so both
    // verdicts occur (the corpus is ~30-word-vocabulary word salad:
    // vocab_ratio and top_frac carry the signal).
    "p05_quality_filter" -> ((s, dir) =>
      qualityFilter(documents(s, dir)).orderBy("doc_id")),

    // Deterministic 16-shard training shuffle.
    "p06_shuffle_shard" -> ((s, dir) =>
      shuffleShard(documents(s, dir), nShards = 16)
        .orderBy("doc_id")),

    // Target mixture en:de:fr = 2:1:1 (es/zh dropped). Whichever
    // stratum binds (fr at sf0.01, de at sf0.001/sf0.1 — the fixture
    // counts differ per SF) rides through at rate 1, so the keep-all
    // "g"-threshold edge is exercised at every SF.
    "p07_mixture_sample" -> ((s, dir) =>
      mixtureSample(documents(s, dir),
          weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.0),
          strataCol = "lang")
        .orderBy("doc_id")),

    // Assignments from [[lengthBucketBatches]] rolled up to the
    // padding-efficiency report: pad_waste = what a batch pads every
    // member to its max length costs. Hash-checked end to end — the
    // oracle rebuilds assignment AND report.
    "p08_length_batches" -> ((s, dir) =>
      lengthBucketBatches(documents(s, dir))
        .groupBy("bucket", "shard", "batch")
        .agg(count(lit(1)).as("n_docs"),
          max("n_toks").as("max_toks"),
          sum("n_toks").cast("long").as("sum_toks"))
        .withColumn("pad_waste",
          col("max_toks").cast("long") * col("n_docs") - col("sum_toks"))
        .orderBy("bucket", "shard", "batch")),

    // Exactly 50 docs per language by smallest content hash — the
    // eval-pool sampler. The oracle is the NAIVE whole-stratum window,
    // so the hash-match proves the two-phase prefilter is lossless.
    "p09_exact_k_sample" -> ((s, dir) =>
      exactKSample(documents(s, dir), k = 50, strataCol = "lang")
        .orderBy("lang", "rk")),

    // p06 at epoch 1 — the between-epoch reshuffle: an independent
    // deterministic order from the same corpus.
    "p10_epoch_shuffle" -> ((s, dir) =>
      shuffleShard(documents(s, dir), nShards = 16, epoch = 1)
        .orderBy("doc_id")),

    // Length-weighted corpus draw: 100 docs, long docs preferred in
    // proportion to n_chars. TakeOrderedAndProject — never a sort.
    "p11_weighted_sample" -> ((s, dir) =>
      weightedPrioritySample(documents(s, dir), k = 100)
        .orderBy("priority", "doc_id")),

    // Column profile of the corpus table (exact-NDV path so DuckDB can
    // replay it); lang_alt = nullif(lang,'en') exercises null counting.
    "p12_profile" -> ((s, dir) =>
      profile(
        documents(s, dir).withColumn("lang_alt",
          when(col("lang") === "en", lit(null)).otherwise(col("lang"))),
        Seq("doc_id", "lang", "lang_alt", "n_chars"))
        .orderBy("col_name")),

    // Cross-split contamination: verified near-dup pairs whose members
    // landed in DIFFERENT splits — the leakage [[splitAssign]]'s
    // content hashing can only prevent for byte-identical text, and
    // the audit every eval split needs before a benchmark claim. Two
    // equi-joins of the TINY cached pair artifact (true near-dups
    // only) against the zero-shuffle split map; the corpus is never
    // self-joined here. Rates 25%/25% (vs p04's 5%) so the fixture
    // yields a non-trivial leak set.
    "p13_split_leakage" -> ((s, dir) => {
      val sp = splitAssign(documents(s, dir),
        testRate = 16384, valRate = 16384)
      Dedup.verifiedNearDupPairs(s, dir)
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
          Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
          Seq("doc_b"))
        .filter(col("split_a") =!= col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }),

    // 32-token chunks, 8-token overlap (sized so fixture docs — up to
    // ~100 tokens — genuinely split), full provenance back to the
    // source span; zero joins, one scan, in-row slicing.
    "p14_chunk_overlap" -> ((s, dir) =>
      chunkOverlap(documents(s, dir), chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_idx"))
  )

  def oracles: Map[String, String] = Map(
    "p01_pack_sequences" ->
      """WITH x AS (
           SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_toks
           FROM documents),
         c AS (
           SELECT *, SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
           FROM x)
         SELECT doc_id, lang, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
           CAST((cum_toks - n_toks) // 512 AS BIGINT) AS bin
         FROM c ORDER BY doc_id""",

    "p02_sample_stratified" ->
      """SELECT doc_id, lang, substring(md5(text), 1, 4) AS bucket
         FROM documents
         WHERE substring(md5(text), 1, 4) <
           CASE lang WHEN 'en' THEN '4000' ELSE '8000' END
         ORDER BY doc_id""",

    "p03_quantize_embeddings" ->
      """WITH b AS (
           SELECT vec_id, embedding AS e,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx
           FROM embeddings)
         SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
           CAST(CASE WHEN mx = mn THEN 0
                ELSE least(255, floor((CAST(e[i] AS DOUBLE) - mn) * 255 / (mx - mn)))
                END AS BIGINT) AS q,
           mn, mx
         FROM b, unnest(generate_series(1, len(e))) AS t(i)
         ORDER BY vec_id, dim""",

    "p04_split_assign" ->
      """SELECT doc_id, substring(md5(text), 1, 4) AS bucket,
           CASE WHEN substring(md5(text), 1, 4) < '0ccd' THEN 'test'
                WHEN substring(md5(text), 1, 4) < '199a' THEN 'val'
                ELSE 'train' END AS split
         FROM documents ORDER BY doc_id""",

    "p05_quality_filter" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         pt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
         st AS (
           SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_toks,
             CAST(COUNT(*) AS BIGINT) AS n_vocab,
             CAST(MAX(c) AS BIGINT) AS top_cnt,
             CAST(SUM(len(tok) * c) AS BIGINT) AS n_tok_chars,
             CAST(MAX(CASE WHEN tok IN ('the','a','and','of','to') THEN 1 ELSE 0 END) AS BIGINT) AS has_stop
           FROM pt GROUP BY doc_id)
         SELECT doc_id, n_toks,
           n_vocab / n_toks AS vocab_ratio,
           top_cnt / n_toks AS top_frac,
           n_tok_chars / n_toks AS mean_tok_len,
           has_stop,
           (n_toks BETWEEN 20 AND 1000
             AND n_vocab / n_toks >= 0.2
             AND top_cnt / n_toks <= 0.2
             AND n_tok_chars / n_toks BETWEEN 2.0 AND 12.0
             AND has_stop = 1) AS keep
         FROM st ORDER BY doc_id""",

    "p06_shuffle_shard" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         s AS (
           SELECT doc_id,
             CAST(CAST(('0x' || substring(h, 1, 4)) AS BIGINT) * 16 // 65536
               AS INTEGER) AS shard,
             substring(h, 5, 12) AS ord
           FROM h)
         SELECT doc_id, shard, ord,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id)
             AS INTEGER) AS rnk
         FROM s ORDER BY doc_id""",

    "p07_mixture_sample" ->
      """WITH c AS (
           SELECT lang,
             CASE lang WHEN 'en' THEN 2.0 WHEN 'de' THEN 1.0
                       WHEN 'fr' THEN 1.0 END AS w,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM documents
           WHERE lang IN ('en', 'de', 'fr') GROUP BY lang),
         t AS (SELECT MIN(CAST(n AS DOUBLE) / w) AS t FROM c),
         thr AS (
           SELECT lang,
             CASE WHEN CAST(floor(w * t / CAST(n AS DOUBLE) * 65536) AS BIGINT)
                    >= 65536 THEN 'g'
                  ELSE lpad(lower(hex(
                    CAST(floor(w * t / CAST(n AS DOUBLE) * 65536) AS BIGINT))),
                    4, '0') END AS thr
           FROM c, t)
         SELECT d.doc_id, d.lang, substring(md5(d.text), 1, 4) AS bucket
         FROM documents d JOIN thr ON d.lang = thr.lang
         WHERE substring(md5(d.text), 1, 4) < thr.thr
         ORDER BY d.doc_id""",

    // Same md5-prefix shard map as p06's oracle; batch = chunk of 8 by
    // doc_id order within (bucket, shard).
    "p08_length_batches" ->
      """WITH t AS (
           SELECT doc_id, text,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
               AS n_toks
           FROM documents),
         b AS (
           SELECT doc_id, n_toks,
             CAST(n_toks // 16 AS INTEGER) AS bucket,
             CAST(CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT)
               * 4 // 65536 AS INTEGER) AS shard
           FROM t),
         r AS (SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY bucket, shard ORDER BY doc_id) AS rn
               FROM b),
         g AS (SELECT bucket, shard,
                 CAST((rn - 1) // 8 AS INTEGER) AS batch, n_toks
               FROM r)
         SELECT bucket, shard, batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n_toks) AS max_toks, CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
           CAST(CAST(MAX(n_toks) AS BIGINT) * COUNT(*)
             - CAST(SUM(n_toks) AS BIGINT) AS BIGINT) AS pad_waste
         FROM g GROUP BY bucket, shard, batch
         ORDER BY bucket, shard, batch""",

    // Deliberately the naive one-window form the Spark side avoids:
    // hash-matching it proves the two-phase prefilter loses nothing.
    "p09_exact_k_sample" ->
      """WITH r AS (
           SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
           FROM documents)
         SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 50 ORDER BY lang, rk""",

    // p06's oracle with the epoch-1 salt on the hashed text.
    "p10_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id, md5(text || '#1') AS h FROM documents),
         s AS (
           SELECT doc_id,
             CAST(CAST(('0x' || substring(h, 1, 4)) AS BIGINT) * 16 // 65536
               AS INTEGER) AS shard,
             substring(h, 5, 12) AS ord
           FROM h)
         SELECT doc_id, shard, ord,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id)
             AS INTEGER) AS rnk
         FROM s ORDER BY doc_id""",

    // Priority = h/w as ONE IEEE division of exact longs — the double
    // hash-matches Spark's bit for bit.
    "p11_weighted_sample" ->
      """SELECT doc_id, n_chars,
           CAST(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS priority
         FROM documents WHERE n_chars > 0
         ORDER BY priority, doc_id LIMIT 100""",

    // One aggregate over one scan, then unpivoted by hand — the same
    // long format the Spark side's stack() emits.
    "p12_profile" ->
      """WITH d AS (
           SELECT doc_id, lang, nullif(lang, 'en') AS lang_alt, n_chars
           FROM documents),
         a AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(doc_id) AS BIGINT) AS nn1,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd1,
             CAST(MIN(doc_id) AS VARCHAR) AS mn1,
             CAST(MAX(doc_id) AS VARCHAR) AS mx1,
             CAST(COUNT(lang) AS BIGINT) AS nn2,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nd2,
             CAST(MIN(lang) AS VARCHAR) AS mn2,
             CAST(MAX(lang) AS VARCHAR) AS mx2,
             CAST(COUNT(lang_alt) AS BIGINT) AS nn3,
             CAST(COUNT(DISTINCT lang_alt) AS BIGINT) AS nd3,
             CAST(MIN(lang_alt) AS VARCHAR) AS mn3,
             CAST(MAX(lang_alt) AS VARCHAR) AS mx3,
             CAST(COUNT(n_chars) AS BIGINT) AS nn4,
             CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS nd4,
             CAST(MIN(n_chars) AS VARCHAR) AS mn4,
             CAST(MAX(n_chars) AS VARCHAR) AS mx4
           FROM d)
         SELECT * FROM (
           SELECT 'doc_id' AS col_name, n_rows, n_rows - nn1 AS n_nulls,
             nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
           UNION ALL SELECT 'lang', n_rows, n_rows - nn2, nd2, mn2, mx2 FROM a
           UNION ALL SELECT 'lang_alt', n_rows, n_rows - nn3, nd3, mn3, mx3 FROM a
           UNION ALL SELECT 'n_chars', n_rows, n_rows - nn4, nd4, mn4, mx4 FROM a)
         ORDER BY col_name""",

    // d03's pair relation composed with p04's md5-threshold split CASE
    // (thresholds 0x4000/0x8000 = 25%/25%); leakage = pair members in
    // different splits.
    "p13_split_leakage" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tokens
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tokens)-2),
             i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
           FROM docs WHERE len(tokens) >= 3),
         counts AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         good AS (
           SELECT doc_a, doc_b, inter / (ca.n_sh + cb.n_sh - inter) AS jaccard
           FROM pairs
           JOIN counts ca ON ca.doc_id = doc_a
           JOIN counts cb ON cb.doc_id = doc_b
           WHERE inter / (ca.n_sh + cb.n_sh - inter) >= 0.5),
         sp AS (
           SELECT doc_id,
             CASE WHEN substring(md5(text), 1, 4) < '4000' THEN 'test'
                  WHEN substring(md5(text), 1, 4) < '8000' THEN 'val'
                  ELSE 'train' END AS split
           FROM documents)
         SELECT doc_a, doc_b, sa.split AS split_a, sb.split AS split_b, jaccard
         FROM good
         JOIN sp sa ON sa.doc_id = doc_a
         JOIN sp sb ON sb.doc_id = doc_b
         WHERE sa.split <> sb.split
         ORDER BY doc_a, doc_b""",

    "p14_chunk_overlap" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         c AS (SELECT doc_id, toks, n,
           CASE WHEN n <= 32 THEN 1
                ELSE 1 + CAST(ceil((n - 32)::DOUBLE / 24) AS INT) END AS nc
           FROM n)
         SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * 24 AS INTEGER) AS start_tok,
           CAST(LEAST(32, n - i * 24) AS INTEGER) AS chunk_tokens,
           array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
         FROM c, LATERAL unnest(range(nc)) AS u(i)
         ORDER BY doc_id, chunk_idx"""
  )
}
