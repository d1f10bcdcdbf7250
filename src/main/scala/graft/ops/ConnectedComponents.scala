package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation (the dedup-cluster resolver: near-dup PAIRS over-delete
  * when similarity is non-transitive; components give each document a
  * stable cluster id).
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors — two shuffles per round (edge⋈label + groupBy, then the
  * label update join), state is one (id, label) row per node, lineage
  * is truncated per round with localCheckpoint so plan depth stays
  * O(1) instead of O(rounds). The driver holds only a per-round
  * changed-count scalar, never row data.
  *
  * Rounds needed = component diameter. Near-dup graphs are shallow
  * (LSH components are dense blobs, diameter 2-4), so this beats the
  * constant-factor-heavy O(log n) large-star/small-star alternation in
  * practice; `maxRounds` guards the adversarial long-chain case — on
  * hitting it we fail loudly rather than return half-merged clusters.
  */
object ConnectedComponents {

  /** Opt-in per-round trace (env var so forked ScaleCheck children
    * inherit it): the scale sweeps record CONVERGENCE ROUNDS as
    * first-class evidence — near-dup blobs should stay diameter 2-4
    * however many copies the corpus gains. */
  private val logRounds = sys.env.contains("GRAFT_CC_LOG")

  /** Label every node in `nodes(nodeCol)` with the min node id of its
    * component under undirected `edges(srcCol, dstCol)`. Returns
    * (`nodeCol` → "id", "label"). Node ids must be non-null; edges may
    * reference only a subset of nodes (the rest stay singletons).
    *
    * Only edge-touched nodes enter the loop: a node with no edge can
    * never change label, and in a deduplicated corpus near-dup members
    * are a small minority — loop state is |touched|, not |V|, and the
    * untouched majority joins back once at the end as singletons. */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, maxRounds: Int = 50): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym
      .select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0) {
      round += 1
      val neighborMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy("dst").agg(min("label").as("nmin"))
      // every touched node has ≥1 neighbor, so the join is inner: nmin
      // always exists (self-label still wins via least)
      val staged = labels
        .join(neighborMin, labels("id") === neighborMin("dst"))
        .select(col("id"), col("label"),
          least(col("label"), col("nmin")).as("next"))
        .localCheckpoint()
      changed = staged.filter(col("next") < col("label")).count()
      if (logRounds) println(s"[cc] round=$round changed=$changed")
      // bound CHANGE rounds only: up to maxRounds rounds may report
      // changes, and a run converging in exactly maxRounds still gets
      // its zero-change confirmation pass (round maxRounds+1)
      require(changed == 0 || round <= maxRounds,
        s"connected components did not converge in $maxRounds rounds " +
          "(component diameter exceeds the bound); raise maxRounds")
      labels = staged.select(col("id"), col("next").as("label"))
    }
    attachLabels(nodes, nodeCol, labels)
  }

  /** Shared closing step of both variants: left-join the computed
    * (id, label) pairs onto the node set; absent nodes are singletons
    * labeling themselves. One copy so the two algorithms can never
    * return differently-shaped results. */
  private def attachLabels(nodes: DataFrame, nodeCol: String,
      pairs: DataFrame): DataFrame =
    nodes
      .select(col(nodeCol).as("id"))
      .join(pairs.select(col(pairs.columns(0)).as("tid"),
        col(pairs.columns(1)).as("tlabel")), col("id") === col("tid"), "left")
      .select(col("id"), coalesce(col("tlabel"), col("id")).as("label"))

  /** Alternating large-star/small-star variant (the O(log n)-round
    * algorithm from the MapReduce connected-components literature) for
    * graphs where [[labels]]' O(diameter) rounds is the wrong bound —
    * long chains, lattice-like graphs. Near-dup blobs don't need it;
    * an adversarial similarity graph might.
    *
    * State is an edge list that converges to a star per component
    * (every node → its component min). Per round: one groupBy per
    * star operation, both with map-side partial agg on the collected
    * neighbor mins; edges stay (child > parent)-oriented so the list
    * shrinks monotonically once stars form.
    */
  def labelsStar(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, maxRounds: Int = 50): DataFrame = {
    // orient every edge large→small ((u,v) with u > v), drop loops
    def orient(df: DataFrame): DataFrame = df
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    var l = orient(edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))).distinct()
      .localCheckpoint()
    var round = 0
    var done = false
    while (!done) {
      round += 1
      // LARGE-STAR: per node u over ALL neighbors (both directions),
      // m = min(Γ(u) ∪ {u}); link every strictly-larger neighbor to m.
      val nbrAll = l.unionAll(l.select(col("v").as("u"), col("u").as("v")))
      val mAll = nbrAll.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = orient(nbrAll.join(mAll, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
        .distinct()
      // SMALL-STAR: per node u over its SMALLER neighbors (the list is
      // already (u > v)-oriented), m = min; link u and each smaller
      // neighbor to m.
      val mSmall = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val next = orient(afterLarge.join(mSmall, "u")
        .select(explode(array(col("u"), col("v"))).as("u"),
          col("m").as("v")))
        .distinct()
        .localCheckpoint()
      val changed = next.unionAll(l).groupBy("u", "v").count()
        .filter(col("count") === 1).limit(1).count()
      if (logRounds) println(s"[cc] star round=$round changed=$changed")
      done = changed == 0
      require(done || round <= maxRounds,
        s"star contraction did not converge in $maxRounds rounds")
      l = next
    }
    // l is now a star forest: u → component min. Singletons label
    // themselves.
    attachLabels(nodes, nodeCol, l.select(col("u"), col("v")))
  }
}
