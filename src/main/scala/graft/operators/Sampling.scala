package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Training mixtures need *reproducible* samples: the same corpus and
  * config must pick the same rows on every run, on any cluster layout.
  * `rand()`-based sampling is seed-and-partitioning dependent; this is
  * content-hash-based instead — a row's fate depends only on its id and
  * the salt. That also makes samples composable: two samples with
  * different salts are independent, and a 10% sample is a strict subset
  * of the 20% sample at the same salt (nested, so mixture weights can
  * be re-tuned without resampling everything).
  *
  * Scale shape: a narrow map (hash + compare) with full predicate
  * pushdown of everything else — no shuffle, no state. At 100 TB the
  * scan is the cost; sampling itself is free.
  */
object Sampling {

  /** Granularity of the sampling lattice: rates resolve to 1/10⁶. */
  val Buckets: Long = 1000000L

  /** Uniform [0, 10⁶) bucket from a row id: first 8 hex digits of
    * md5(salt:id). md5 (not xxhash64) so an external system — or the
    * DuckDB oracle — can reproduce membership with stock functions. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long") % Buckets

  /** Per-stratum Bernoulli sample: keep a row iff its bucket clears the
    * stratum's rate. `rates` maps stratum value → rate in [0,1];
    * strata not listed fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "smp"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === stratum, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(idCol, salt))
      .where(col("bucket") < threshold)
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by hash
    * rank — the "at most k examples per source/domain" curation rule.
    * Unlike a rate sample, the output size per group is exact
    * (min(k, group size)); hash order makes the pick reproducible and
    * unbiased by storage order. One shuffle on the group key feeding a
    * ranked window; a skewed group is one window partition — at 100 TB
    * cap the skew by pre-filtering with a rate sample sized to ~k·10
    * expected survivors, then rank the survivors. */
  def capPerGroup(df: DataFrame, idCol: Column, groupCol: Column, k: Int,
      salt: String = "cap"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(concat_ws(":", lit(salt), idCol.cast("string"))), idCol)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each row draws u from its deterministic hash lattice and keys as
    * −ln(u)/w — taking the k SMALLEST keys is exactly a weight-
    * proportional sample without replacement (the exponent-form
    * equivalent of taking the largest u^(1/w); the log form keeps full
    * double precision at large weights, where u^(1/w) collapses onto
    * 1.0 and the pick degenerates to the id tie-break). Here u is the
    * salted-md5 bucket (reproducible, engine-replayable) instead of
    * rand(). Engine stability: ln(u) is rounded to 9 decimals (libm
    * ulp differences vanish far below that grid), and the remaining
    * −x/w is a single IEEE-exact division — bit-identical on any
    * engine, as the DuckDB oracle replays. orderBy+limit plans as
    * TakeOrdered (per-partition top-k + driver merge — no global
    * sort) — the quality-weighted curation pick at any scale. Rows
    * with non-positive weight key to +∞ (never chosen before any
    * positive-weight row). */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column, k: Int,
      salt: String = "wtd"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = (hashBucket(idCol, salt).cast("double") + 0.5) / lit(1000000.0)
    df.withColumn("wkey",
        when(weightCol.cast("double") <= 0, lit(Double.PositiveInfinity))
          .otherwise(-round(log(u), 9) / weightCol.cast("double")))
      .orderBy(col("wkey").asc, idCol)
      .limit(k)
  }

  /** Skew-capped [[capPerGroup]]: identical selection, but a group far
    * over the cap is first thinned by a rate filter on the SAME md5 the
    * rank orders by, so the ranked window never buffers a 10⁸-row hot
    * group — only ~`survivorFactor`·k rows of it.
    *
    * Exactness: the window ranks by md5 string ascending; the
    * pre-filter keeps exactly the rows whose md5 starts below a
    * per-group hex threshold — a PREFIX of that same ordering — so as
    * long as ≥ k rows survive, the survivors contain the true top-k
    * and the result is row-identical to [[capPerGroup]] (pinned by
    * SamplingSpec's giant-group case). Survivors are
    * Binomial(n, ~factor·k/n): with the default factor 10 the
    * shortfall probability at k=50 is < 10⁻³⁰⁰ — if a cosmic-ray draw
    * ever hits it, the group returns fewer than k rows (fail-small,
    * never wrong rows).
    *
    * Scale shape: one partial-agg count per group (tiny output,
    * broadcast back) + the narrow hash filter, then the same ranked
    * window over bounded partitions. */
  def capPerGroupSkewSafe(df: DataFrame, idCol: Column, groupCol: Column, k: Int,
      salt: String = "cap", survivorFactor: Int = 10): DataFrame = {
    require(k > 0 && survivorFactor >= 2,
      s"need k > 0 and survivorFactor >= 2, got $k/$survivorFactor")
    val target = k.toLong * survivorFactor
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    // per-group threshold as an 8-hex-digit string compared against the
    // md5 prefix; "g" sorts above every hex digit, so small groups keep
    // all rows without a separate code path
    val thr = counts.select(col("__g"),
      when(col("__n") <= target, lit("g"))
        .otherwise(lpad(lower(hex(
          ceil(lit(4294967296.0) * target / col("__n")).cast("long"))), 8, "0"))
        .as("__thr"))
    val h = md5(concat_ws(":", lit(salt), idCol.cast("string")))
    // null-SAFE join key: capPerGroup's window keeps a NULL group as
    // its own partition, so the pre-thin must too (=== would drop
    // every null-group row and break the row-identical claim)
    val filtered = df.join(broadcast(thr), groupCol <=> col("__g"))
      .where(h < col("__thr"))
      .drop("__g", "__thr")
    capPerGroup(filtered, idCol, groupCol, k, salt)
  }

  /** Mixture re-weighting: downsample each group so its share of the
    * total `weightCol` mass (tokens, chars, bytes) lands at
    * `share(group)` — the standard pre-training mixture step.
    * Per-group rate = min(1, share · total_mass / group_mass): groups
    * over their budget are hash-downsampled, groups at or under budget
    * pass through whole (no upsampling).
    *
    * Determinism across engines: group masses stay exact integers
    * through both aggregations (no double-sum ordering); the rate is
    * one double expression (share · total / mass) evaluated in the
    * same operation order everywhere, floored onto the bucket lattice.
    *
    * Scale shape: two map-side-partial aggregations over the group
    * column (a handful of rows out), rates broadcast back, then the
    * same zero-shuffle hash filter as [[stratifiedSample]]. */
  def mixtureSample(df: DataFrame, idCol: Column, groupCol: Column,
      weightCol: Column, shares: Map[String, Double], defaultShare: Double,
      salt: String = "mix"): DataFrame = {
    require((shares.values.toSeq :+ defaultShare).forall(s => s >= 0 && s <= 1),
      "shares must be in [0,1]")
    val share = shares.foldLeft(lit(defaultShare)) {
      case (acc, (g, s)) => when(col("__g") === g, lit(s)).otherwise(acc)
    }
    val masses = df.groupBy(groupCol.as("__g"))
      .agg(sum(weightCol.cast("long")).as("__mass"))
    val total = masses.agg(sum(col("__mass")).as("__total"))
    // a zero-mass group is trivially under budget — keep it whole
    // (otherwise 0/0 → null threshold would silently drop the group)
    val thresholds = masses.crossJoin(broadcast(total))
      .select(col("__g"),
        when(col("__mass") === 0, lit(Buckets))
          .otherwise(floor(least(lit(1.0),
            share * col("__total").cast("double") / col("__mass").cast("double"))
            * Buckets).cast("long")).as("__thr"))
    df.join(broadcast(thresholds), groupCol === col("__g"))
      .withColumn("bucket", hashBucket(idCol, salt))
      .where(col("bucket") < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Temperature-flattened mixture sampling (the mT5/UniMax-family
    * multilingual recipe): group probability p_g ∝ mass_g^(1/τ), so
    * τ=1 is proportional (no flattening) and τ→∞ is uniform; the kept
    * budget is `budgetFrac · total_mass`, split across groups by p_g,
    * and each group's rate = min(1, p_g · budget / mass_g) — head
    * groups are hash-downsampled toward the flattened share, tail
    * groups pass through whole (no upsampling).
    *
    * Determinism across engines: masses stay exact integers; the one
    * genuinely floating step — mass^(1/τ) — lands on the 1e-6 integer
    * grid immediately (and uses `sqrt` when 1/τ = 0.5: sqrt is
    * IEEE-correctly-rounded in both the JVM and C, `pow` is only
    * 1-ulp-accurate), so the normalizing sum is an order-free BIGINT
    * sum and the final rate is one fixed-order double expression
    * floored onto the bucket lattice — the [[mixtureSample]] pattern.
    *
    * Scale shape: identical to [[mixtureSample]] — two tiny
    * aggregations, thresholds broadcast, zero-shuffle hash filter. */
  /** UniMax epoch-capped budget allocation (the successor to
    * temperature flattening): distribute a token budget `B = frac ·
    * total` across groups so every group is sampled as UNIFORMLY as
    * possible subject to "no group repeats more than `maxEpochs`
    * times". The water-filling solution sorts groups by mass
    * ascending; a group is CAPPED (gets maxEpochs·mass) while its cap
    * is below the equal share of what remains, and capping is
    * prefix-closed in mass order, so one window pass decides:
    *   capped_i  ⟺  maxE·m_i·(n−i+1) ≤ B − Σ_{j<i} maxE·m_j
    * (cross-multiplied — no division anywhere near the decision), and
    * the uncapped groups split the remainder equally (floor; the
    * ≤ n_uncapped−1 remainder tokens stay unassigned, documented).
    * Exact BIGINT throughout → engine-replayable. Output one row per
    * group: (group, mass, rank, capped, budget, epochs_bp), epochs_bp
    * = budget·10⁴ div mass.
    *
    * Scale shape: one partial-agg shuffle to group masses (|groups|
    * rows) + one tiny window — the corpus is touched once; the
    * allocation table then drives whatever per-row rate filter the
    * pipeline applies (cf. [[temperatureSample]]'s hash filter). */
  def unimaxAllocation(df: DataFrame, groupCol: Column, weightCol: Column,
      maxEpochs: Int, budgetFrac: Double): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0,1], got $budgetFrac")
    val masses = df.groupBy(groupCol.as("group"))
      .agg(sum(weightCol.cast("long")).as("mass"))
    val tot = masses.agg(sum(col("mass")).as("total"), count(lit(1)).as("n"))
    // integer budget: floor(frac * total) via exact integer arithmetic
    // on the 1e-6 grid (frac quantized once, like the rate lattice)
    val fracI = math.round(budgetFrac * 1000000.0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mass"), col("group"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("mass"), col("group"))
    val staged = masses.crossJoin(broadcast(tot))
      .select(col("group"), col("mass"), col("n"),
        expr(s"(total * $fracI) div 1000000").as("budget_total"))
      .withColumn("rank", row_number().over(wAll))
      .withColumn("prefix",
        coalesce(sum(lit(maxEpochs.toLong) * col("mass")).over(w), lit(0L)))
    val flagged = staged.withColumn("capped",
      lit(maxEpochs.toLong) * col("mass") * (col("n") - col("rank") + 1) <=
        col("budget_total") - col("prefix"))
    val capAgg = flagged.agg(
      sum(when(col("capped"), lit(maxEpochs.toLong) * col("mass")).otherwise(0L))
        .as("cap_total"),
      sum(when(col("capped"), 0L).otherwise(1L)).as("n_unc"))
    flagged.crossJoin(broadcast(capAgg))
      .select(col("group"), col("mass"), col("rank").cast("long").as("rank"),
        col("capped"),
        when(col("capped"), lit(maxEpochs.toLong) * col("mass"))
          .otherwise(expr("(budget_total - cap_total) div n_unc")).as("budget"))
      .withColumn("epochs_bp",
        when(col("mass") === 0, lit(0L))
          .otherwise(expr("(budget * 10000) div mass")))
      .orderBy(col("rank"))
  }

  def temperatureSample(df: DataFrame, idCol: Column, groupCol: Column,
      weightCol: Column, tau: Double, budgetFrac: Double,
      salt: String = "temp"): DataFrame = {
    require(tau >= 1.0, s"temperature must be >= 1, got $tau")
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0,1], got $budgetFrac")
    val inv = 1.0 / tau
    val massD = col("__mass").cast("double")
    val flat = if (inv == 0.5) sqrt(massD) else pow(massD, lit(inv))
    val w = df.groupBy(groupCol.as("__g"))
      .agg(sum(weightCol.cast("long")).as("__mass"))
      .select(col("__g"), col("__mass"),
        round(flat * 1e6).cast("long").as("__w_i"))
    val tot = w.agg(sum(col("__mass")).as("__total"), sum(col("__w_i")).as("__sumw_i"))
    val thresholds = w.crossJoin(broadcast(tot))
      .select(col("__g"),
        when(col("__mass") === 0, lit(Buckets))
          .otherwise(floor(least(lit(1.0),
            lit(budgetFrac) *
              (col("__w_i").cast("double") / col("__sumw_i").cast("double")) *
              (col("__total").cast("double") / col("__mass").cast("double")))
            * Buckets).cast("long")).as("__thr"))
    df.join(broadcast(thresholds), groupCol === col("__g"))
      .withColumn("bucket", hashBucket(idCol, salt))
      .where(col("bucket") < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Corpus-unbounded EXACT top-fraction gate: keep the
    * floor(num·n/den) best rows under the total order
    * (score DESC, md5-bucket ASC, id ASC) — with NO corpus-wide rank
    * window, NO TakeOrdered over a corpus-proportional k, and NO
    * driver-side count. The rank-gate shape (`orderBy(...).limit(k)`)
    * funnels all k kept rows through one merge task, which caps it at
    * ~10⁸ docs; this gate is a cascade of three bounded selections:
    *
    *  1. Scores are on the 1e-6 grid, so a `groupBy(score).count()`
    *     histogram has at most (score-range · 10⁶)+1 rows — bounded by
    *     the score RANGE, not the corpus. One cumulative window over
    *     the histogram (single partition over ≤ 10⁶ rows — the
    *     text_ccnet precedent) finds the cut: grid values whose whole
    *     tie group fits inside k keep outright; exactly ONE grid value
    *     straddles the cut and carries a residual quota m₁.
    *  2. Inside that one boundary tie group, the salted-md5 lattice
    *     bucket plays the same role one level down: a ≤ 10⁶-row bucket
    *     histogram + cumulative pass keeps whole buckets up to m₁ and
    *     isolates ONE partial bucket with quota m₂.
    *  3. The partial bucket holds ~|tie group|/10⁶ rows (md5-uniform:
    *     10⁴ rows even for a 10¹⁰-doc degenerate all-ties corpus) — an
    *     exact `row_number` by id over that one bucket finishes the
    *     selection.
    *
    * Both histogram joins broadcast (≤ 10⁶ rows each); n and k come
    * from a broadcast aggregate, not a driver action. The md5 bucket
    * (not the raw id) breaks score ties so the boundary pick is
    * ingest-order-unbiased AND replayable by the DuckDB oracle as a
    * plain `row_number() OVER (ORDER BY score DESC, bucket, id)` —
    * SamplingSpec pins gate == global-rank on boundary-tie and
    * bucket-collision fixtures.
    *
    * CALLER CONTRACT: `scoreCol` must lie on the 1e-6 grid (i.e. be a
    * `round(x, 6)` product — every graft score is). An off-grid score
    * would silently merge distinct scores into one tie group in step 1,
    * diverging from the documented total order — so the grid
    * precondition is ENFORCED per row: any score farther than 1e-3
    * grid units from its rounded value raises at execution time
    * (a codegen'd compare, negligible next to the histogram pass).
    * SUPPORTED MAGNITUDE: |score| ≤ 1e6. The guard's 1e-3 tolerance is
    * ABSOLUTE in grid units, which is only meaningful while double ulp
    * at score·1e6 stays well under it (ulp ≤ 2⁻¹⁰ up to ~4e12 grid
    * units); beyond ~1e13 every score would trip the guard spuriously,
    * and conversely a genuinely off-grid score within 1e-9 of a grid
    * point passes silently at any magnitude. Scores past 1e6 raise a
    * dedicated magnitude error rather than the misleading grid one.
    * Graft scores are all in [0,1], far inside the bound. */
  def topFraction(df: DataFrame, scoreCol: Column, idCol: Column,
      num: Long, den: Long, salt: String): DataFrame = {
    require(num >= 0 && den > 0, s"need num >= 0, den > 0, got $num/$den")
    val outCols = df.columns.map(col).toIndexedSeq
    val scaled = scoreCol * lit(1e6)
    val si = df.withColumn("__si",
      when(abs(scaled) > lit(1e12),
        raise_error(concat(
          lit("graft.Sampling.topFraction: |score| exceeds the supported "
            + "1e6 magnitude bound (double ulp at score*1e6 would swamp "
            + "the grid tolerance): "),
          scoreCol.cast("string"))).cast("long"))
      .when(abs(scaled - round(scaled)) <= lit(1e-3),
        round(scaled).cast("long"))
      .otherwise(raise_error(concat(
        lit("graft.Sampling.topFraction: score off the 1e-6 grid "
          + "(caller must pre-round scores with round(x, 6)): "),
        scoreCol.cast("string"))).cast("long")))
    val hist1 = si.groupBy(col("__si")).agg(count(lit(1)).as("__c"))
    val w1 = org.apache.spark.sql.expressions.Window
      .orderBy(col("__si").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // n from the histogram itself (Σ __c counts every row) — one
    // bounded re-aggregation instead of a second corpus scan
    val n = broadcast(hist1.agg(sum(col("__c")).as("__n")))
    // grid values still in play: whole groups inside k, plus the one
    // straddling group with its residual quota m1
    val g1 = hist1
      .withColumn("__cum", coalesce(sum(col("__c")).over(w1), lit(0L)))
      .crossJoin(n)
      .withColumn("__k", expr(s"($num * __n) div $den"))
      .where(col("__cum") < col("__k"))
      .select(col("__si"),
        (col("__cum") + col("__c") <= col("__k")).as("__all"),
        (col("__k") - col("__cum")).as("__m1"))
    val j1 = si.join(broadcast(g1), Seq("__si"))
    val keepWhole = j1.where(col("__all"))
    val boundary = j1.where(!col("__all"))
      .withColumn("__b", hashBucket(idCol, salt))
    // __m1 is constant across the boundary group; max() carries it
    // into the bucket histogram without a second broadcast
    val hist2 = boundary.groupBy(col("__b"))
      .agg(count(lit(1)).as("__c2"), max(col("__m1")).as("__q"))
    val w2 = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val g2 = hist2
      .withColumn("__cum2", coalesce(sum(col("__c2")).over(w2), lit(0L)))
      .where(col("__cum2") < col("__q"))
      .select(col("__b"),
        (col("__cum2") + col("__c2") <= col("__q")).as("__all2"),
        (col("__q") - col("__cum2")).as("__m2"))
    val j2 = boundary.join(broadcast(g2), Seq("__b"))
    val keepBucket = j2.where(col("__all2"))
    val w3 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(idCol)
    val keepPartial = j2.where(!col("__all2"))
      .withColumn("__rn", row_number().over(w3))
      .where(col("__rn") <= col("__m2"))
    keepWhole.select(outCols: _*)
      .unionByName(keepBucket.select(outCols: _*))
      .unionByName(keepPartial.select(outCols: _*))
  }

  // --------------------------------- 144: DoReMi-style domain reweighting
  /** Domain-mixture reweighting via multiplicative-weights updates on
    * per-domain excess loss (the DoReMi recipe, deterministic
    * fixed-reference form): domains whose mean score falls below the
    * corpus mean (harder domains, by the convention that `scoreMiCol`
    * is a fluency/quality score in 1e-6 integer units, higher =
    * easier) are upweighted, then the learned weights drive a
    * hash-lattice sample toward the reweighted mixture.
    *
    * The exponentiated-gradient step is LINEARIZED onto the integer
    * grid — w ← (w · (10⁶ + clamp(⌊excess/etaDen⌋, ±25·10⁴))) div 10⁶,
    * renormalized to Σw = 10⁶ (floor) each round — so every update is
    * exact BIGINT arithmetic both engines replay bit-identically
    * (exp() never crosses an engine boundary). Division semantics:
    * all operands are positive, where Spark's `div` (truncate) and
    * DuckDB's `//` (floor) agree; the two floor() calls on possibly-
    * negative means are explicit doubles-floor, identical in both.
    *
    * Per-domain keep rate = min(1, quota/n_g) with quota = budget ·
    * w/10⁶ and budget = ⌊N·budgetFrac⌋ docs; membership is the salted
    * [[hashBucket]] lattice (nested, composable, layout-independent).
    *
    * Scale shape: one partial-agg shuffle to |domains| rows, the
    * 3-round update entirely on that tiny frame (global-window sums
    * over |domains| rows), thresholds broadcast back, zero-shuffle
    * hash filter — the [[mixtureSample]] shape plus a constant number
    * of tiny passes.
    *
    * Output: input rows kept, plus (excess_mi, w_mi, thr, bucket).
    * NULL-domain rows are DROPPED (plain equality membership join —
    * the same rows a SQL `JOIN ... USING (domain)` replay drops): a
    * NULL domain is an upstream labeling bug, and silently weighting
    * it as its own domain would skew every other domain's quota.
    * SamplingSpec pins the drop. */
  /** The multiplicative-weights core of [[doremiSample]], exposed for
    * the streaming mixer face: takes the per-domain counter table
    * (__g, __n, __s) — n docs and the exact-BIGINT 1e-6-grid score
    * sum — and returns (__g, __n, __nn, __excess, __w) after `rounds`
    * linearized updates (see [[doremiSample]] for the arithmetic
    * contract). Everything runs on the |domains|-row frame. */
  private[graft] def doremiWeights(dom: DataFrame, rounds: Int,
      etaDen: Long): DataFrame = {
    require(rounds >= 1 && etaDen >= 1, s"bad rounds=$rounds/etaDen=$etaDen")
    val tot = dom.agg(sum(col("__n")).as("__nn"), sum(col("__s")).as("__ss"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)) // |domains| rows — one tiny partition
    var cur = dom.crossJoin(broadcast(tot))
      .select(col("__g"), col("__n"), col("__nn"),
        (floor(col("__ss").cast("double") / col("__nn").cast("double")).cast("long")
          - floor(col("__s").cast("double") / col("__n").cast("double")).cast("long"))
          .as("__excess"))
      .withColumn("__factor", lit(Buckets) +
        greatest(lit(-250000L), least(lit(250000L),
          floor(col("__excess").cast("double") / etaDen.toDouble).cast("long"))))
      .withColumn("__w", lit(Buckets))
    for (_ <- 1 to rounds) {
      cur = cur
        .withColumn("__w", expr("(__w * __factor) div 1000000"))
        .withColumn("__wsum", sum(col("__w")).over(wAll))
        .withColumn("__w", expr("(__w * 1000000) div __wsum"))
        .drop("__wsum")
    }
    cur.drop("__factor")
  }

  def doremiSample(df: DataFrame, idCol: Column, groupCol: Column,
      scoreMiCol: Column, rounds: Int = 3, etaDen: Long = 2L,
      budgetFrac: Double = 0.5, salt: String = "drm"): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0,1], got $budgetFrac")
    val fracI = math.round(budgetFrac * Buckets)
    val dom = df.groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).as("__n"), sum(scoreMiCol.cast("long")).as("__s"))
    val thr = doremiWeights(dom, rounds, etaDen)
      .withColumn("__quota", expr(s"(((__nn * $fracI) div 1000000) * __w) div 1000000"))
      .select(col("__g"), col("__excess"), col("__w"),
        least(lit(Buckets), expr("(__quota * 1000000) div __n")).as("__thr"))
    // plain equality (NOT null-safe): NULL-domain rows drop, matching
    // the oracle's inner `JOIN ... USING (source)` — a null-safe join
    // here would weight the NULL pseudo-domain and diverge cross-engine
    df.join(broadcast(thr), groupCol === col("__g"))
      .withColumn("bucket", hashBucket(idCol, salt))
      .where(col("bucket") < col("__thr"))
      .withColumnRenamed("__excess", "excess_mi")
      .withColumnRenamed("__w", "w_mi")
      .withColumnRenamed("__thr", "thr")
      .drop("__g")
  }
}
