package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew- and locality-aware join helpers (SURVEY §5).
  *
  * AQE's skew-join split handles most skew at runtime; these are the
  * explicit tools for the cases it can't: a dimension too large to
  * broadcast joined on a key with pathological hot values
  * ([[saltedJoin]]), and repeated co-located joins on the same key
  * where the shuffle should be paid once at write time (bucketed
  * tables, see BucketingSpec).
  */
object Joins {

  /** Equi-join a skewed fact side against a (non-broadcastable)
    * dimension, salting the hot keys: the fact side gets a per-row
    * salt in [0, factor), the dim side is replicated once per salt
    * value, and the join key becomes (key, salt) — a hot key's rows
    * now spread over `factor` reducers instead of one straggler task.
    *
    * Result set is identical to `fact.join(dim, key)`: every fact row
    * meets every dim row of its key exactly once (the dim replica with
    * the matching salt). Cost: dim shuffle volume × factor — the
    * classic skew trade.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** As-of join: for each left row, attach `payload` from the latest
    * right row with `right(rightTime) <= left(leftTime)` on the same
    * `keys` (left-outer: unmatched left rows keep null payload).
    *
    * Spark has no ASOF JOIN operator; the naive encoding — a range
    * theta-join plus a per-left-row max — is a broadcast nested loop.
    * This is the scalable shape instead: tag both sides, union, and run
    * one `last(_, ignoreNulls)` window per payload column ordered by
    * (time, side). Right rows sort before left rows at equal times, so
    * the match is inclusive (`>=`), like DuckDB's ASOF JOIN. Cost: a
    * single hash shuffle of n+m rows on `keys` — no join at all, and
    * the window is a linear scan per key. At 100 TB this is the
    * merge-join formulation you'd hand-write in a native engine.
    *
    * Determinism: right must be unique per (keys, rightTime) — equal
    * timestamps within a key would make `last` order-dependent.
    * Pre-aggregate the right side to enforce that (the shipped q_asof
    * query does).
    *
    * `payload` column names must not collide with left's columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = payload.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    matched.where(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Nearest-in-time join — the bidirectional sibling of [[asofJoin]]
    * (sensor fusion / measurement alignment: match each left row to
    * the CLOSEST right row in time, before or after, ties to the
    * prior side). Same single-shuffle union+window shape, no nested
    * loop: one window pass carries the latest prior right row
    * forward, a mirrored frame carries the earliest later right row
    * backward, and a per-row comparison on integer epoch micros picks
    * the nearer (a same-timestamp right row sorts before the left row,
    * so it is seen as "prior" at distance 0 — consistent with the tie
    * rule). Left rows with no right match at all keep null payload.
    * Right side should be unique per (keys, time) — pre-aggregate as
    * with [[asofJoin]]. Adds `nearest_time` (the matched right time)
    * to the payload columns. */
  def asofNearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTime).as("__tr")) ++ payload.map(col): _*)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "earliest later right row" as a RUNNING frame over the DESC sort:
    // a [currentRow, unboundedFollowing] frame looks symmetric but
    // Spark's UnboundedFollowingWindowFunctionFrame re-scans the rest
    // of the partition per row — O(p²) on a hot key, exactly the skew
    // this single-shuffle design exists to avoid. last() over the
    // descending running frame selects the same row (the smallest
    // (__t, __side) above the current row; a same-__t right row sorts
    // AFTER the left row under __side desc, so it stays prev-only,
    // preserving the distance-0 tie rule) in O(p). Both sorts share
    // one hash exchange — still a single shuffle.
    val wNext = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the nearest ROW travels as one struct: per-column ignoreNulls
    // windows would skip a NULL payload value and splice a farther
    // row's payload onto the nearest row's timestamp. The struct is
    // null exactly on left rows (when/otherwise), so ignoreNulls
    // selects whole right rows atomically.
    val rowStruct = when(col("__side") === 0,
      struct(col("__tr") +: payload.map(col): _*)).otherwise(lit(null))
    val df = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__prev", last(rowStruct, ignoreNulls = true).over(wPrev))
      .withColumn("__next", last(rowStruct, ignoreNulls = true).over(wNext))
    val tp = col("__prev").getField("__tr")
    val tn = col("__next").getField("__tr")
    val dp = unix_micros(col("__t")) - unix_micros(tp)
    val dn = unix_micros(tn) - unix_micros(col("__t"))
    val usePrev = tn.isNull || (tp.isNotNull && dp <= dn)
    val outs = payload.map(p =>
      when(usePrev, col("__prev").getField(p))
        .otherwise(col("__next").getField(p)).as(p)) :+
      when(usePrev, tp).otherwise(tn).as("nearest_time")
    df.where(col("__side") === 1)
      .select(leftCols.map(col) ++ outs: _*)
  }

  /** Range (interval containment) join: points × intervals where
    * `lo <= point <= hi`, equi-matched on `keys` first (pass Nil for a
    * keyless interval join). All three bound columns must be numeric
    * (epoch micros, not timestamps — callers convert).
    *
    * Spark plans a bare non-equi join as a broadcast nested loop /
    * cartesian — O(n·m) and a scale-killer. This instead turns the
    * range predicate into an equi-join on a coarse bucket: each
    * interval is exploded to the buckets of width `bucketWidth` it
    * overlaps, each point maps to exactly one bucket, and the residual
    * BETWEEN filter runs after the hash join. A (point, interval) match
    * shares exactly one bucket — the point's — so no dedup is needed.
    *
    * Cost: interval replication = ceil(span / bucketWidth) + 1; pick
    * `bucketWidth` near the median interval span so replication stays
    * O(1) while bucket population stays balanced. Hot buckets (many
    * intervals at one time) are ordinary join skew — AQE splits them.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ints = intervals.withColumn("__b", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points.withColumn("__b",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(ints, keys :+ "__b")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  // ---------------------------------------------------- spatial self-join
  /** All point pairs within an L∞ radius (|Δlat| ≤ r AND |Δlon| ≤ r,
    * in integer micro-degrees) — the spatial neighborhood join behind
    * duplicate-report collapse, DBSCAN-style clustering and
    * co-location analysis.
    *
    * Scale shape: GRID BUCKETING, the spatial analogue of [[rangeJoin]]
    * — the plane is tiled into r×r cells, each point lands in exactly
    * one home cell, and one side additionally probes its 9-cell
    * neighborhood (a 9× map-side replication, no data-dependent
    * blowup). Any L∞-close pair shares (probe-cell == home-cell) for
    * exactly one of the 9 probes — lossless, and no pair-dedup needed.
    * The join is a plain hash equi-join on the cell id; a naive
    * |Δlat| ≤ r theta join would plan as a broadcast nested loop.
    * Hot cells (urban clusters) are ordinary join skew — AQE splits
    * them, or cut `radiusMicroDeg`.
    *
    * Coordinates quantize via floor(deg · 10⁶) — IEEE multiply +
    * floor, bit-identical in any engine; all subsequent arithmetic is
    * integer (floor-division cells via the pmod identity, exact for
    * negative coordinates where `div` truncation would mis-bucket).
    * Returns (id_a, id_b, dlat_u, dlon_u), id_a < id_b. */
  def spatialNeighborPairs(df: DataFrame, idCol: org.apache.spark.sql.Column,
      latCol: org.apache.spark.sql.Column, lonCol: org.apache.spark.sql.Column,
      radiusMicroDeg: Long): DataFrame = {
    require(radiusMicroDeg > 0, s"radius must be positive, got $radiusMicroDeg")
    val r = radiusMicroDeg
    val pts = df.select(idCol.as("sid"),
      floor(latCol * 1000000.0).cast("long").as("lat_u"),
      floor(lonCol * 1000000.0).cast("long").as("lon_u"))
    // floor division that is correct for negatives: x - pmod(x, r) is
    // the largest multiple of r at or below x, and dividing an exact
    // multiple is exact
    def cell(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(r))) / lit(r)).cast("long")
    // the home table feeds BOTH sides of the self-join and exchange
    // reuse does not fire across consumer branches — un-materialized,
    // the upstream subtree (e.g. a full enrichment) executes twice
    // (measured 2x on storm_neighbors). Eager, like every
    // Materialize.once operator.
    val home = graft.Materialize.once(
      pts.select(col("sid"), col("lat_u"), col("lon_u"),
        cell(col("lat_u")).as("cx"), cell(col("lon_u")).as("cy")))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val probe = home.select(col("sid").as("id_a"),
      col("lat_u").as("la"), col("lon_u").as("lo"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }: _*)).as("c"))
      .select(col("id_a"), col("la"), col("lo"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    probe.join(home, Seq("cx", "cy"))
      .where(col("id_a") < col("sid") &&
        abs(col("la") - col("lat_u")) <= r && abs(col("lo") - col("lon_u")) <= r)
      .select(col("id_a"), col("sid").as("id_b"),
        abs(col("la") - col("lat_u")).as("dlat_u"),
        abs(col("lo") - col("lon_u")).as("dlon_u"))
  }

  // ------------------------------------------------------ fuzzy self-join
  /** Edit-distance ≤ 1 self-join via 1-DELETION NEIGHBORHOODS (the
    * FastSS / SymSpell candidate rule): each string posts itself plus
    * its `len` single-character deletions; two strings within
    * Levenshtein distance 1 necessarily share a variant (equality →
    * the string itself; substitution at i → both delete i;
    * insert/delete → the longer's deletion equals the shorter), so the
    * variant equi-join is a LOSSLESS candidate generator and the exact
    * `levenshtein` verify only prices candidates.
    *
    * Scale shape: one explode (len+1 variants per string — bounded by
    * the key length, so cap/truncate keys upstream for long text), one
    * shuffle on the variant, exact verify on survivors. The naive form
    * is an O(n²) cross join with a levenshtein filter — a broadcast
    * nested loop that dies at any scale; here pair work is driven by
    * variant collisions, which for natural-key vocabularies are the
    * near-duplicates themselves. Returns (id_a, id_b, str_a, str_b,
    * dist ≤ 1) with id_a < id_b. */
  def fuzzyPairsDist1(df: DataFrame, idCol: org.apache.spark.sql.Column,
      strCol: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(idCol.as("fid"), strCol.as("fstr"))
    // s + all single-deletions of s (distinct — deleting either of a
    // doubled letter yields the same variant). The variant table feeds
    // BOTH sides of the self-join and exchange reuse does not fire
    // across consumer branches — un-materialized, the upstream scan +
    // explode executed twice and the whole right side planned as a
    // BroadcastExchange (fine for a dim table, fatal for a corpus).
    // Materialized, the sides hash-shuffle on `v` (SMJ/shuffled-hash
    // under AQE) like every other self-join in the library.
    val variants = graft.Materialize.once(base.select(col("fid"), col("fstr"),
      explode(array_distinct(transform(
        sequence(lit(0), length(col("fstr"))),
        i => when(i === 0, col("fstr")).otherwise(concat(
          col("fstr").substr(lit(1), i - 1),
          col("fstr").substr(i + 1, length(col("fstr")) - i)))))).as("v")))
    val a = variants.select(col("v"), col("fid").as("id_a"), col("fstr").as("str_a"))
    val b = variants.select(col("v"), col("fid").as("id_b"), col("fstr").as("str_b"))
    // force a shuffled join on the variant: the static size estimate
    // under the explode is blind to the (len+1)× multiplier (measured:
    // a 9·10⁵-row variant table still planned BuildRight broadcast),
    // and at corpus scale that mis-estimate broadcasts the corpus.
    // With the merge hint the join hash-shuffles on `v` — AQE still
    // skew-splits hot variants, and the tiny-input cost is one small
    // shuffle.
    a.join(b.hint("merge"), Seq("v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"))
      .dropDuplicates("id_a", "id_b") // a pair may share several variants
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .where(col("dist") <= 1)
  }
}
