package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge set — the
  * cluster-density diagnostic for the near-dup graph (LSH banding emits
  * near-cliques; triangle participation separates tight paraphrase
  * clusters from chains of borderline pairs that components alone can't
  * tell apart).
  *
  * Algorithm: compact-forward (Latapy 2008; the standard distributed
  * formulation, e.g. Suri & Vassilvitskii "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11). Each edge is ORIENTED from its
  * lower- to its higher-(degree, id) endpoint; wedges form only at each
  * edge pair's common LOW vertex, and a triangle {u,v,w} materializes
  * exactly once — at its minimum-rank vertex, closed by the oriented
  * (v,w) edge. The orientation is the skew defense: a degree-d hub
  * generates wedges only from its OUT-edges, and out-degree under
  * degree-ordering is bounded by O(sqrt(m)) on any graph — so the
  * boilerplate hub that would explode an id-oriented wedge join
  * quadratically contributes at most m^{1/2} pairs. Total work is
  * O(m^{3/2}) worst case, vs O(sum deg^2) unoriented.
  *
  * Plan shape: one degree agg (node-sized), two hash joins tagging edge
  * endpoints with degrees, one self-join on the low vertex (the wedge
  * stage, partitioned by vertex), one equi-join against the oriented
  * edge set to close wedges. Every join is key-equi — never a cross
  * product — and AQE's skew split handles residual hot vertices. The
  * per-doc output is orientation-invariant, which is what lets the
  * DuckDB oracle recompute it with the simple id-ordered join.
  */
object Triangles {

  /** All closed triangles of an undirected edge list as (a, lo, hi)
    * rows — `a` the minimum-(deg, id)-rank vertex where the wedge
    * formed, (lo, hi) its other two corners in rank order. Each
    * triangle appears EXACTLY once; shared by the vertex-count and
    * edge-support faces.
    */
  private def closedTriangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("u"), col(bCol).as("v"))
    val deg = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // Orient each edge toward the higher (deg, id) endpoint; keep the
    // destination's rank key so the wedge stage can order its two ends
    // without re-joining degrees.
    val tagged = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = tagged.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst"), col("dv").as("ddst")))
        .otherwise(
          struct(col("v").as("src"), col("u").as("dst"), col("du").as("ddst")))
        .as("o"))
      .select(col("o.src"), col("o.dst"), col("o.ddst"))
    // Wedges at the common low vertex, ends ordered by (deg, id) so each
    // unordered wedge appears once; the closing edge is then exactly the
    // oriented (lo, hi) row if the triangle exists.
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("a"), col("x.dst").as("lo"), col("y.dst").as("hi"))
    wedges.join(
      oriented.select(col("src").as("lo"), col("dst").as("hi")), Seq("lo", "hi"))
      .select(col("a"), col("lo"), col("hi"))
  }

  /** Per-vertex triangle participation counts over an undirected,
    * deduplicated edge list (`aCol` < `bCol` convention, one row per
    * edge). Output: (doc_id, n_triangles), vertices in >= 1 triangle.
    */
  def vertexTriangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val closed = closedTriangles(edges, aCol, bCol)
    closed.select(col("a").as("doc_id"))
      .unionAll(closed.select(col("lo").as("doc_id")))
      .unionAll(closed.select(col("hi").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-EDGE triangle support in canonical (min-id, max-id) form: each
    * closed triangle credits its three edges once. Support is the
    * k-truss signal — an edge in >= k-2 triangles survives the k-truss
    * — and the basis for [[trussEdges]].
    */
  def edgeSupport(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = (u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =>
      struct(least(u, v).as("ea"), greatest(u, v).as("eb"))
    closedTriangles(edges, aCol, bCol)
      .select(explode(array(
        canon(col("a"), col("lo")),
        canon(col("a"), col("hi")),
        canon(col("lo"), col("hi")))).as("e"))
      .groupBy(col("e.ea").as(aCol), col("e.eb").as(bCol))
      .agg(count(lit(1)).as("support"))
  }

  /** The edges surviving a k-truss cut: support >= minSupport (k-truss
    * proper iterates this to a fixed point; ONE cut — support computed
    * on the full graph — is the cheap first iteration, and is already
    * the load-bearing dedup refinement: it severs zero-triangle bridge
    * edges between otherwise-dense paraphrase cliques, the exact
    * chain-vs-clique failure mode components alone cannot see. The
    * single-cut semantics is what the oracle floods; iterate by feeding
    * the output back when full truss peeling is wanted.)
    */
  def trussEdges(edges: DataFrame, aCol: String, bCol: String, minSupport: Long): DataFrame =
    edges.select(col(aCol), col(bCol))
      .join(edgeSupport(edges, aCol, bCol), Seq(aCol, bCol))
      .filter(col("support") >= minSupport)
      .select(col(aCol), col(bCol))
}
