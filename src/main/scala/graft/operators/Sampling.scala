package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines. The
  * built-in `Dataset.sample` draws from a partition-seeded RNG, so the
  * selected set changes with partitioning, task retries, and scale-ups —
  * unacceptable when a 100 TB mixture has to be reproducible and
  * auditable. Here membership is a pure function of the row key: an
  * md5-derived 60-bit hash mapped to a uniform `u ∈ [0,1)`, kept iff
  * `u < rate(stratum)`. Per-row expression work only (no shuffle, no
  * state), identical output on any cluster layout, and the same formula
  * runs in DuckDB for the oracle. (Extension territory — SURVEY.md §2.1.)
  */
object Sampling {

  /** 2^60 as a double; the hash below is 60 bits so `u` is in [0, 1). */
  private val TwoPow60 = 1152921504606846976.0

  /** Uniform [0,1) deterministic in the key: [[Dedup.hash60]] of the
    * key's decimal string over 2^60, bit-identical in DuckDB.
    */
  def uniformHash(key: Column): Column =
    Dedup.hash60(key.cast("string")).cast("double") / lit(TwoPow60)

  /** Stratified sample: keep a row iff `uniformHash(doc_id) <
    * rate(stratum)`, where `rates` maps stratum values to keep-rates and
    * `defaultRate` covers unlisted strata. Expects a `doc_id` column;
    * `strata` is any string expression over the input (language, source
    * domain, quality bucket). Returns (doc_id, stratum, u) for the kept
    * rows — `u` is exposed so downstream re-sampling can tighten a rate
    * without rescanning (keep `u < r'` ⊂ `u < r` for r' < r, the nested
    * property hash sampling gives for free).
    */
  def stratified(docs: DataFrame, strata: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col("stratum") === s, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id"), strata.as("stratum"),
        uniformHash(col("doc_id")).as("u"))
      .filter(col("u") < rate)
  }

  /** Weighted sampling WITHOUT replacement (d70) — Efraimidis & Spirakis
    * 2006 ("Weighted random sampling with a reservoir"): draw `u_i`
    * uniform per item, key `u_i^(1/w_i)`, and the k LARGEST keys are an
    * exact probability-proportional-to-weight sample without
    * replacement — the one-pass, order-free construction production
    * mixture jobs need (a sequential weighted reservoir cannot shard).
    * Deterministic here: `u` is the md5 hash uniform above, and the key
    * is compared in the log domain (`ln(u)/w`, larger = better since
    * ln u < 0) rounded to DECIMAL(28,8) — the established cross-engine
    * ln device — with doc_id as the total-order tiebreak.
    *
    * Scale shape: per-row expression work plus ONE top-k, which plans
    * as TakeOrderedAndProject (per-partition k-row heads, single k-row
    * merge on the driver side of the exchange) — no global sort is
    * materialized at any corpus size. Zero-or-negative weights are
    * excluded (they have probability 0 in the published scheme).
    *
    * Returns the k selected rows as (doc_id, w, priority), ordered by
    * draw priority (first row = first draw in the equivalent
    * sequential scheme).
    */
  /** The Efraimidis-Spirakis draw priority as ONE shared expression —
    * ln(u)/w quantized at DECIMAL(28,8) (the ln device), exposed as
    * DOUBLE (decimal→double is the same nearest-double in both
    * engines). [[weightedSample]] and the streaming reservoirs
    * ([[graft.streaming.EventTimeOps]]) build on it, so the batch and
    * streaming draws cannot drift.
    */
  def esPriority(id: Column, weight: Column): Column =
    (log(uniformHash(id)) / weight.cast("double"))
      .cast("decimal(28,8)").cast("double")

  def weightedSample(docs: DataFrame, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    docs.select(col("doc_id"), weight.cast("double").as("w"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("w"),
        esPriority(col("doc_id"), col("w")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  /** Deterministic EPOCH shuffle (d95): every training epoch gets its
    * own full permutation of the corpus, and each permutation is split
    * round-robin into `nShards` loader shards — the dataloader-facing
    * order a multi-epoch run consumes. The permutation key is
    * hash60("<epoch>:<doc_id>"), so epoch e's order is (a) a pure
    * function of (epoch, doc_id) — reproducible on any cluster layout,
    * resumable mid-epoch — and (b) statistically independent across
    * epochs (a fresh salt re-keys the whole hash), which is what
    * "reshuffle every epoch" means operationally.
    *
    * The global per-epoch rank uses the distributed-rank device
    * ([[graft.operators.TextAnalysis.perplexityTiers]] doc): bucket by
    * the key's high `bucketBits` bits (bucket order IS key order — the
    * bucket is a key prefix), rank within (epoch, bucket) windows, add
    * per-bucket base offsets from the tiny totals table. No
    * single-partition corpus-wide window at any scale; `rk` is
    * contiguous from 1 per epoch, so `(rk-1) % nShards` balances
    * shards to ±1 row BY CONSTRUCTION (a bare `hash % nShards` only
    * balances in expectation).
    *
    * Returns (epoch, doc_id, rk, shard).
    */
  def epochShuffle(docs: DataFrame, epochs: Int, nShards: Int,
      bucketBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochs >= 1, s"epochs=$epochs")
    require(nShards >= 1, s"nShards=$nShards")
    require(bucketBits > 0 && bucketBits < 60, s"bucketBits=$bucketBits")
    val base = docs.select(col("doc_id"))
      .withColumn("epoch", explode(expr(s"sequence(0L, ${epochs - 1}L)")))
      .withColumn("k", Dedup.hash60(
        concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
      .withColumn("bkt", expr(s"shiftright(k, ${60 - bucketBits})"))
    val inBkt = Window.partitionBy(col("epoch"), col("bkt"))
      .orderBy(col("k"), col("doc_id"))
    val counts = base.groupBy(col("epoch"), col("bkt"))
      .agg(count(lit(1)).as("bc"))
    val offsets = counts.select(col("epoch"), col("bkt"),
      (sum(col("bc")).over(
        Window.partitionBy(col("epoch")).orderBy(col("bkt"))) - col("bc"))
        .as("off"))
    base
      .withColumn("rn", row_number().over(inBkt))
      .join(offsets, Seq("epoch", "bkt"))
      .select(col("epoch"), col("doc_id"),
        (col("off") + col("rn")).cast("long").as("rk"))
      .withColumn("shard", ((col("rk") - 1) % nShards).cast("long"))
  }

  /** Cumulative-fraction hash cutoffs for [[hashSplit]], computed in
    * BigDecimal so the query side and the SQL oracle inject the SAME
    * integer literals (a double-rounded 0.8*2^60 could differ in the
    * last ulp between independent evaluations). Returns one upper
    * bound per split, final bound = 2^60 exactly.
    */
  def splitCuts(fracs: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fracs.nonEmpty, "fracs must be non-empty")
    // from the exact Long — BigDecimal(Double) rounds through the
    // SHORTEST-round-trip decimal string (1.152921504606847E18), which
    // is off by 24 from 2^60
    val two60 = BigDecimal(1L << 60)
    val cums = fracs.scanLeft(BigDecimal(0)) { case (acc, (_, f)) =>
      acc + BigDecimal(f)
    }.tail
    require((cums.last - 1).abs < BigDecimal("1e-9"),
      s"fractions must sum to 1, got ${cums.last}")
    val cuts = fracs.map(_._1).zip(cums).map { case (name, c) =>
      name -> (c * two60).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }
    // snap the last cut to exactly 2^60 so every hash value is covered
    cuts.init :+ (cuts.last._1 -> (1L << 60))
  }

  /** Deterministic train/val/test split (d96): assign each doc to a
    * named split by where hash60("<salt>:<doc_id>") lands among the
    * cumulative-fraction cutoffs of the 60-bit hash space. Membership
    * is a pure function of (salt, doc_id): splits are disjoint and
    * exhaustive BY CONSTRUCTION, stable under corpus growth (a new doc
    * never moves an old one), and re-salting redraws the whole
    * assignment — the properties ad-hoc `ORDER BY rand() LIMIT n`
    * splits lack. Per-row expression work only; no shuffle.
    *
    * Returns (doc_id, split).
    */
  def hashSplit(docs: DataFrame, salt: String,
      fracs: Seq[(String, Double)]): DataFrame = {
    val cuts = splitCuts(fracs)
    // CASE WHEN h < cut1 THEN name1 WHEN h < cut2 THEN name2 … ELSE last
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), els) => when(col("__h") < cut, lit(name)).otherwise(els)
    }
    docs.select(col("doc_id"),
        Dedup.hash60(concat(lit(salt), lit(":"), col("doc_id").cast("string")))
          .as("__h"))
      .select(col("doc_id"), split.as("split"))
  }

  /** Systematic (stratified-point) resampling WITH replacement (d97) —
    * Kitagawa 1996's low-variance resampler, the standard way to
    * realize "sample n docs proportional to token count" with
    * replacement: lay every document's tokens end-to-end on [0, W)
    * (the d47 deterministically-shuffled prefix-sum stream), drop n
    * evenly-spaced probe points p_j = ⌊(2j+1)·W / 2n⌋ (midpoints of n
    * equal strata — all integer arithmetic, no RNG), and select the
    * document whose token interval contains each point. A doc with
    * weight w is drawn ⌊n·w/W⌋ or ⌈n·w/W⌉ times — the minimum-variance
    * realization of the multinomial — and the whole draw is a pure
    * function of the corpus.
    *
    * Scale shape: intervals come from [[Packing.tokenOffsets]] (the
    * bucketed distributed prefix sum — no global window); point-in-
    * interval matching is [[RangeJoin.pointInInterval]]'s bin-bucketed
    * EQUI-join (no broadcast nested loop, no cartesian); the only
    * driver round is the single total-W scalar (the d91 cut
    * convention). Points are generated ON the cluster
    * (`spark.range(n)`). Each point lands in exactly one half-open
    * interval (the stream is contiguous from 0), so the output is
    * exactly n rows.
    *
    * Returns (sample_id, point, doc_id, n_tokens) ordered by nothing —
    * callers order; sample_id 0..n-1.
    */
  def systematicResample(docs: DataFrame, n: Int,
      bucketBits: Int = 8): DataFrame = {
    require(n >= 1, s"n=$n")
    val off = Packing.tokenOffsets(docs, bucketBits)
      .withColumn("end_token", col("start_token") + col("n_tokens"))
      .localCheckpoint(true) // read twice: total-W probe + the join
    val w = off.agg(max(col("end_token"))).head().getLong(0)
    require(w > 0, "empty corpus")
    val spark = docs.sparkSession
    val points = spark.range(0, n.toLong).toDF("sample_id")
      .withColumn("point", // integer floor-div: Column./ would go DOUBLE
        expr(s"((sample_id * 2 + 1) * ${w}L) div ${2L * n}L"))
    val binWidth = math.max(1L, w / (2L * n))
    RangeJoin.pointInInterval(off, points, Seq.empty,
        "start_token", "end_token", "point", binWidth)
      .select(col("sample_id"), col("point"), col("doc_id"), col("n_tokens"))
  }

  /** Vose alias table from integer weights (d134) — the O(1)-per-draw
    * weighted-source sampler every multi-source dataloader runs: K
    * columns, each holding a primary stratum, an integer threshold in
    * units of W = Σw, and an alias stratum. Column j picked uniformly
    * and a uniform v ∈ [0, W) compared against the threshold realizes
    * stratum i with probability EXACTLY wᵢ/W — the construction keeps
    * every intermediate in exact integer units (scaled mass wᵢ·K),
    * so the table is deterministic and the mass identity
    * Σ_j [primary_j = i]·thr_j + [alias_j = i]·(W − thr_j) = wᵢ·K
    * holds exactly (spec-asserted — the algorithm's correctness proof
    * as an executable check). Work queues pop in the input sequence's
    * order, making the table a pure function of the weight list.
    *
    * Returns (col, primary, threshold, alias); threshold = W means the
    * column never defers to its alias (alias = primary then).
    */
  def aliasTable(weights: Seq[(String, Long)]): Seq[(Int, String, Long, String)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), s"weights=$weights")
    val k = weights.size
    val w = weights.map(_._2).sum
    var mass = weights.map { case (s, wi) => s -> wi * k }.toMap
    var small = weights.collect { case (s, wi) if wi * k < w => s }.toList
    var large = weights.collect { case (s, wi) if wi * k >= w => s }.toList
    val cols = scala.collection.mutable.Map.empty[String, (Long, String)]
    while (small.nonEmpty && large.nonEmpty) {
      val s = small.head; small = small.tail
      val l = large.head; large = large.tail
      cols(s) = (mass(s), l)
      mass = mass.updated(l, mass(l) - (w - mass(s)))
      if (mass(l) < w) small ::= l else large ::= l
    }
    (small ++ large).foreach(s => cols(s) = (w, s))
    weights.zipWithIndex.map { case ((s, _), i) =>
      val (thr, alias) = cols(s)
      (i, s, thr, alias)
    }
  }

  /** Realize `nSlots` dataloader slots against an alias table (d134):
    * slot → column via h mod K, slot → v via (h div K) mod W, stratum =
    * primary if v < threshold else alias. Pure scan-side expression
    * work over a range — no joins, no shuffle, reproducible on any
    * layout (the same hash-keyed discipline as [[hashSplit]]); the
    * modulo-W draw carries a ≤ W/2⁶⁰ bias, identical in both engines.
    * Returns (slot, stratum).
    */
  def aliasRealize(spark: org.apache.spark.sql.SparkSession,
      weights: Seq[(String, Long)], nSlots: Long): DataFrame = {
    val tab = aliasTable(weights)
    val k = tab.size
    val w = weights.map(_._2).sum
    val pick = tab.foldRight(lit(null).cast("string")) {
      case ((j, primary, thr, alias), els) =>
        when(col("j") === j,
          when(col("v") < thr, lit(primary)).otherwise(lit(alias)))
          .otherwise(els)
    }
    spark.range(nSlots).select(col("id").as("slot"),
        Dedup.hash60(concat(lit("alias:"), col("id").cast("string"))).as("h"))
      .withColumn("j", pmod(col("h"), lit(k.toLong)))
      .withColumn("v", pmod(expr(s"h div $k"), lit(w)))
      .select(col("slot"), pick.as("stratum"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic (d149) — the
    * distribution-drift test for NUMERIC columns (the d119 token-JS
    * twin on the other axis; monitoring pipelines run exactly this
    * between corpus versions or A/B slices):
    * D = sup_x |F₁(x) − F₂(x)| over the two empirical CDFs, attained at
    * an observed point, so the sup is a max over the merged distinct
    * values.
    *
    * Exact integer device: at each distinct value the deviation is
    * |c₁·n₂ − c₂·n₁| (cumulative counts cross-multiplied — no division
    * until the very end), so D = max(...)/(n₁·n₂) is exact counts + ONE
    * IEEE divide, bit-identical cross-engine.
    *
    * Scale shape: cumulative counts come from the bucketed distributed
    * prefix device (the d46/d47 rule — within-bucket running sums over
    * a value grid, per-bucket offsets from the bounded bucket table;
    * NO corpus-wide single-partition window; the oracle, free of scale
    * concerns, uses the plain global window). `sample1` picks side 1;
    * everything else in `values` is side 2.
    * Returns one row (n1, n2, ks_d).
    */
  def ksTwoSample(values: DataFrame, sample1: Column, valueCol: Column,
      bucketScale: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pv = values.select(valueCol.as("value"), sample1.as("isA"))
      .groupBy(col("value"))
      .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("k1"),
        sum(when(col("isA"), 0L).otherwise(1L)).as("k2"))
      .withColumn("bkt", floor(col("value") * bucketScale).cast("long"))
      .localCheckpoint(true) // read by the prefix sums, offsets, totals
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("value"))
    val inSum = pv
      .withColumn("s1", sum(col("k1")).over(wIn))
      .withColumn("s2", sum(col("k2")).over(wIn))
    val wOff = Window.orderBy(col("bkt")) // bounded: one row per bucket
    val off = pv.groupBy(col("bkt"))
      .agg(sum(col("k1")).as("b1"), sum(col("k2")).as("b2"))
      .select(col("bkt"),
        (sum(col("b1")).over(wOff) - col("b1")).as("o1"),
        (sum(col("b2")).over(wOff) - col("b2")).as("o2"))
    val tot = pv.agg(sum(col("k1")).cast("long").as("n1"),
      sum(col("k2")).cast("long").as("n2"))
    inSum.join(off, Seq("bkt")).crossJoin(broadcast(tot))
      .select(abs((col("o1") + col("s1")) * col("n2") -
        (col("o2") + col("s2")) * col("n1")).as("m"), col("n1"), col("n2"))
      .groupBy(col("n1"), col("n2")).agg(max(col("m")).as("m"))
      // one-sided input (everything matched sample1, or nothing did)
      // makes n1·n2 = 0 and the statistic NaN — a misconfigured monitor
      // would then stream "no drift" forever; fail loudly instead
      // (raise_error fires lazily, so the streaming twin's per-batch
      // evaluation hits it too). An EMPTY input still yields zero rows.
      .select(col("n1"), col("n2"),
        when(col("n1") === 0L || col("n2") === 0L,
          raise_error(concat(lit("ksTwoSample: one-sided input (n1="),
            col("n1"), lit(", n2="), col("n2"),
            lit(") — the KS statistic is undefined")))
          .cast("double"))
          .otherwise(col("m").cast("double") / (col("n1") * col("n2")))
          .as("ks_d"))
  }
}
