package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over 1e6-scaled long vectors — QUANTIZED
  * on purpose: every E-step distance is an exact integer
  * (`Σ (x_i − c_i)²` of longs), and the M-step re-quantizes each mean
  * back to the long grid with the branch-explicit floor rounding the
  * vector ops share. Cross-engine parity is therefore by construction:
  * no float accumulation order, no libm — the only float op is one
  * correctly-rounded IEEE division per (centroid, dim) per iteration.
  *
  * Scale shape: the E-step ships the k centroids once per executor
  * as a broadcast model and streams each partition through a
  * primitive argmin loop (see [[assign]] for why the declarative
  * cross-join form was abandoned); the M-step is the t24 centroid
  * pattern — posexplode + (cid, dim) groupBy with map-side partial
  * agg. State between iterations is the
  * k-row centroid frame, localCheckpoint'd so plan depth stays O(1).
  * Empty clusters keep their previous centroid (deterministic, and
  * mirrors the oracle's per-dim COALESCE).
  */
object KMeans {

  /** Exact squared L2 distance between two scaled-long arrays (shared
    * with the PQ encode/ADC stages — one distance definition),
    * codegen'd via [[graft.plans.LongArrayDistSq]] (the E-step
    * evaluates it corpus×k times; the interpreted `zip_with` lambda it
    * replaced was the dominant per-row constant). */
  private[graft] def distq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("long_distsq", a, b)

  private def rnd(v: org.apache.spark.sql.Column) =
    graft.functions.ExactNum.rnd(v)

  /** E-step: nearest centroid per vector, ties by centroid id.
    * `emb`: (vec_id, eL), `cent`: (cid, cL) → (vec_id, cid, distq).
    *
    * Implemented as a BROADCAST-MODEL mapPartitions argmin, the
    * charter's last-resort form, earned by measurement: the
    * declarative `crossJoin(broadcast(cent)) → project → groupBy
    * min(struct)` materializes one JOINED ROW PER (vector, centroid)
    * pair, each carrying BOTH 64-long arrays (~1 KB), before the
    * projection reduces it to a scalar — at t57c's ×100 point (200k
    * vectors × 5000 centroids × 5 stages) that is ~5 TB of UnsafeRow
    * copying for ~6×10¹⁰ useful multiply-adds, and the sweep ran 45+
    * minutes without finishing one Lloyd run. Here the k centroid
    * arrays ship ONCE per executor as a plain broadcast (a codebook is
    * a model, not data — the pqCodebook contract), each partition
    * streams its vectors through a primitive-array argmin loop, and no
    * intermediate row ever exists. Same argmin, same (distq, then cid)
    * tie rule (centroids scanned in ascending-cid order, strict <
    * keeps the first), bit-identical output — t25/t44/t57's oracle
    * rows re-verify it. */
  def assign(emb: DataFrame, cent: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Long])] = cent
      .select(col("cid"), col("cL"))
      .as[(Long, Array[Long])]
      .collect()
      .sortBy(_._1)
    // empty model → empty assignment (the crossJoin form's behavior);
    // without this guard argminL would fabricate (MaxValue, MaxValue)
    // rows that downstream M-steps consume as real cluster ids
    if (cents.isEmpty)
      return spark.emptyDataset[(Long, Long, Long)]
        .toDF("vec_id", "cid", "distq")
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("eL")).as[(Long, Array[Long])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (v, x) =>
          val (c, d) = argminL(requireVec(v, x), cs)
          (v, c, d)
        }
      }
      .toDF("vec_id", "cid", "distq")
  }

  /** Fail-fast null guard for the E-step hot loops: a nullable
    * embedding source would otherwise NPE deep inside [[argminL]] with
    * no indication of WHICH row — every call site today is non-null by
    * construction (the parquet embeddings table), so this is armor for
    * the first nullable source someone wires in. */
  private def requireVec(v: Long, x: Array[Long]): Array[Long] = {
    if (x == null) throw new IllegalArgumentException(
      s"null embedding for vec_id=$v: KMeans requires non-null vectors " +
        "(filter or impute nulls upstream)")
    x
  }

  /** Nearest centroid of `x` among `cents` — the shared (distq, cid)
    * tie rule, enforced EXPLICITLY (equal distance keeps the lower
    * cid) so callers may pass centroid arrays in any order (the
    * nprobe path concatenates per-cell lists, which are not globally
    * cid-sorted). */
  private def argminL(x: Array[Long],
      cents: Array[(Long, Array[Long])]): (Long, Long) = {
    var bestD = Long.MaxValue
    var bestC = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)._2
      val n = math.min(x.length, c.length)
      var s = 0L
      var j = 0
      while (j < n) { val d = x(j) - c(j); s += d * d; j += 1 }
      if (s < bestD || (s == bestD && cents(i)._1 < bestC)) {
        bestD = s; bestC = cents(i)._1
      }
      i += 1
    }
    (bestC, bestD)
  }

  /** The `p` nearest centroid ids of `x` among `cents`, ordered by
    * (distq, cid) — the nprobe cell election. `cents` is model-sized
    * (kc entries), so the per-vector sort is O(kc log kc) on a tiny
    * array. */
  private def nearestP(x: Array[Long],
      cents: Array[(Long, Array[Long])], p: Int): Array[Long] = {
    val ds = new Array[(Long, Long)](cents.length) // (distq, cid)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)._2
      val n = math.min(x.length, c.length)
      var s = 0L
      var j = 0
      while (j < n) { val d = x(j) - c(j); s += d * d; j += 1 }
      ds(i) = (s, cents(i)._1)
      i += 1
    }
    ds.sortInPlace()
    ds.iterator.take(p).map(_._2).toArray
  }

  /** TWO-LEVEL (coarse-quantizer) E-step — the k ∝ N serving path
    * t57c's scale note promises: a flat argmin over k = N/target
    * centroids costs O(k) per vector, which at decade scale is the
    * assignment's own quadratic term (×1000 → 62.5k centroids,
    * ~10¹³ long ops). Here each vector resolves its COARSE cell
    * (kc centroids), then argmins only over the fine centroids whose
    * own nearest coarse centroid is that cell — IVF's coarse/fine
    * split applied to the E-step, per-vector cost kc + |cell| instead
    * of kf. A vector whose cell holds no fine centroid falls back to
    * the global fine argmin (`in_cell` = false reports it), so the
    * rule is total and deterministic: rank by (cell match, distq,
    * cid) — the t65 oracle's ROW_NUMBER order. Both centroid frames
    * are models (broadcast once); the fine→cell map is computed
    * driver-side from them. Trades exactness for boundedness exactly
    * like IVF probes do: a vector near a cell border may assign to a
    * neighboring cell's best — t65's gate pins the rule, not
    * flat-argmin equality.
    *
    * `nprobe` is the standard IVF border-fidelity knob: probe the p
    * nearest coarse cells (by the shared (distq, cid) rule) and argmin
    * over the UNION of their fine centroids. p = 1 is the plain
    * two-level rule above; raising p recovers border vectors whose
    * true nearest fine centroid lives in the adjacent cell, at
    * per-vector cost kc + p·(kf/kc). The reported `ccid` stays the
    * PRIMARY (nearest) cell; `in_cell` is true when some probed cell
    * held a fine centroid (the chosen one came from the probed union),
    * false only on the global fallback. */
  def assignTwoLevel(emb: DataFrame, coarse: DataFrame,
      fine: DataFrame, nprobe: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    def cents(df: DataFrame): Array[(Long, Array[Long])] = df
      .select(col("cid"), col("cL")).as[(Long, Array[Long])]
      .collect().sortBy(_._1)
    val cs = cents(coarse)
    val fs = cents(fine)
    require(cs.nonEmpty && fs.nonEmpty,
      "assignTwoLevel needs non-empty coarse and fine models")
    val cells: Map[Long, Array[(Long, Array[Long])]] =
      fs.groupBy(f => argminL(f._2, cs)._1)
        .map { case (cc, fsOfCell) => cc -> fsOfCell.sortBy(_._1) }
    val p = nprobe
    val bc = spark.sparkContext.broadcast((cs, fs, cells))
    emb.select(col("vec_id"), col("eL")).as[(Long, Array[Long])]
      .mapPartitions { it =>
        val (c2, f2, cell2) = bc.value
        val empty = Array.empty[(Long, Array[Long])]
        it.map { case (v, x0) =>
          val x = requireVec(v, x0)
          // p = 1 keeps the allocation-free argmin loop on the serve
          // hot path (nearestP boxes + sorts a kc-tuple array per
          // vector — fine for p ≥ 2, waste for the common default)
          val (primary, cand) =
            if (p == 1) {
              val cc = argminL(x, c2)._1
              (cc, cell2.getOrElse(cc, empty))
            } else {
              val probed = nearestP(x, c2, p)
              (probed(0), probed.flatMap(cc => cell2.getOrElse(cc, empty)))
            }
          val inCell = cand.nonEmpty
          val (fcid, dq) = if (inCell) argminL(x, cand) else argminL(x, f2)
          (v, primary, fcid, dq, inCell)
        }
      }
      .toDF("vec_id", "ccid", "cid", "distq", "in_cell")
  }

  /** M-step: per-cluster re-quantized mean; clusters with no members
    * keep their previous centroid. */
  def step(emb: DataFrame, cent: DataFrame, assigned: DataFrame): DataFrame = {
    val sums = assigned.select("vec_id", "cid")
      .join(emb, "vec_id")
      .select(col("cid"), posexplode(col("eL")).as(Seq("dim", "x")))
      .groupBy("cid", "dim")
      .agg(sum("x").as("sv"), count(lit(1)).as("n"))
      .select(col("cid"), col("dim"),
        rnd(col("sv").cast("double") / col("n")).cast("long").as("cnew"))
    cent
      .select(col("cid"), posexplode(col("cL")).as(Seq("dim", "cold")))
      .join(sums, Seq("cid", "dim"), "left")
      .select(col("cid"), col("dim"), coalesce(col("cnew"), col("cold")).as("c"))
      .groupBy("cid")
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("cL"))
  }

  /** Run exactly `iters` E/M rounds from the first-k init (centroid
    * cid = vec_id of the seed vector), then return the final
    * assignment (vec_id, cid, distq). */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    // materialize the (possibly expensive) scaled input ONCE — it is
    // referenced twice per iteration plus the final assign
    val e = emb.localCheckpoint()
    assign(e, centroidsOn(e, k, iters))
  }

  /** The trained CENTROIDS (cid, cL) after `iters` rounds from the
    * first-k init — the codebook-training entry point ([[fit]] is
    * this plus one final E-step). */
  def fitCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame =
    centroidsOn(emb.localCheckpoint(), k, iters)

  private def centroidsOn(e: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("eL").as("cL"))
      .localCheckpoint()
    for (_ <- 1 to iters)
      cent = step(e, cent, assign(e, cent)).localCheckpoint()
    cent
  }

  // --- grouped variant: many independent codebooks in ONE job set ---
  // The PQ trainer needs M independent k-means runs (one per
  // subspace). Running [[fitCentroids]] M times serializes M×iters
  // rounds of eager jobs; riding a `sub` group key through every
  // stage instead trains ALL codebooks with the per-round job count
  // of one — same arithmetic per (sub, cid), keys just widen (the
  // oracle CTEs are written this way already).

  /** E-step with a group key: `sv` is (vec_id, sub, eL), `cent` is
    * (sub, cid, cL) → (vec_id, sub, cid, distq), nearest centroid
    * WITHIN each sub. Centroid frames stay M·k rows — broadcast. */
  def assignGrouped(sv: DataFrame, cent: DataFrame): DataFrame =
    sv.join(broadcast(cent), "sub")
      .select(col("vec_id"), col("sub"), col("cid"),
        distq(col("eL"), col("cL")).as("distq"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("distq"), col("cid"))).as("__best"))
      .select(col("vec_id"), col("sub"), col("__best.cid").as("cid"),
        col("__best.distq").as("distq"))

  /** M-step with a group key; empty (sub, cid) cells keep their
    * previous centroid, as in [[step]]. */
  def stepGrouped(sv: DataFrame, cent: DataFrame,
      assigned: DataFrame): DataFrame = {
    val sums = assigned.select("vec_id", "sub", "cid")
      .join(sv, Seq("vec_id", "sub"))
      .select(col("sub"), col("cid"), posexplode(col("eL")).as(Seq("dim", "x")))
      .groupBy("sub", "cid", "dim")
      .agg(sum("x").as("sv"), count(lit(1)).as("n"))
      .select(col("sub"), col("cid"), col("dim"),
        rnd(col("sv").cast("double") / col("n")).cast("long").as("cnew"))
    cent
      .select(col("sub"), col("cid"), posexplode(col("cL")).as(Seq("dim", "cold")))
      .join(sums, Seq("sub", "cid", "dim"), "left")
      .select(col("sub"), col("cid"), col("dim"),
        coalesce(col("cnew"), col("cold")).as("c"))
      .groupBy("sub", "cid")
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("cL"))
  }

  /** Train one codebook PER GROUP: `sv` is (vec_id, sub, eL); seeds
    * are the first-k vec_ids within each sub (every sub seeds from
    * the same vectors — the per-sub [[fitCentroids]] equivalence).
    * Returns (sub, cid, cL) after exactly `iters` rounds. */
  def fitCentroidsGrouped(sv: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = sv.localCheckpoint()
    var cent = e.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("cid"), col("eL").as("cL"))
      .localCheckpoint()
    for (_ <- 1 to iters)
      cent = stepGrouped(e, cent, assignGrouped(e, cent)).localCheckpoint()
    cent
  }
}
