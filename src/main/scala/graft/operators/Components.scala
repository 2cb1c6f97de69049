package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Connected components over an undirected pair list — the clustering
  * step that turns near-duplicate PAIRS (minhash/simhash/jaccard output)
  * into duplicate GROUPS, so a pipeline can keep one representative per
  * cluster instead of dropping only directly-linked copies.
  *
  * Two execution paths behind one contract:
  *
  *  - **Small edge sets** (≤ `localMax` distinct directed edges): collect
  *    the edge list and run driver-side union-find, then parallelize the
  *    labeling back out. Near-dup pair sets are orders of magnitude
  *    smaller than the corpus (a few pairs per duplicate family), so even
  *    a 100 TB corpus commonly yields an edge list of a few million rows
  *    — paying 4-6 Spark jobs of distributed iteration for that is pure
  *    fixed cost. The collected set is bounded by `localMax` (~16 bytes a
  *    row), never "the corpus".
  *  - **Large edge sets**: hash-min label propagation. Each node starts
  *    labeled with its own id; every round each node takes the min label
  *    in its closed neighborhood. Converges in O(component diameter)
  *    rounds; per-round cost is one equi-join + one groupBy on node id
  *    (both hash-partitioned, nothing unbounded is broadcast). Lineage is
  *    cut per round (localCheckpoint here; durable checkpoint on a
  *    cluster) so the plan does not grow with iteration count. The
  *    convergence probe rides the round's own aggregate: the self-loop
  *    row carries each node's previous label into the groupBy, so
  *    "no label changed" is a scan of the just-checkpointed round output
  *    — no extra join, no type assumptions on the id column (string/UUID
  *    doc ids work).
  */
object Components {
  /** @return (id, cluster_id, cluster_size) for every node appearing in
    * `pairs`; cluster_id = min node id in the component. */
  def fromPairs(pairs: DataFrame, aCol: String, bCol: String,
                maxIter: Int = 25, localMax: Long = 2000000L): DataFrame = {
    // undirected edge list + self-loops (self-loop keeps a node's own
    // label in the min() so labels never regress, and carries the node's
    // previous label into each round's aggregate for the convergence
    // probe). Built with ONE scan of `pairs` — a 4-way union would
    // re-evaluate the upstream pair plan (typically an expensive near-dup
    // query) once per branch before the persist materializes.
    val e = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")),
        struct(col(aCol).as("src"), col(aCol).as("dst")),
        struct(col(bCol).as("src"), col(bCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labeled =
      if (e.count() <= localMax) localUnionFind(e)
      else propagate(e, maxIter)
    e.unpersist()
    labeled
  }

  /** Driver-side union-find over a collected edge list. Roots are always
    * the component-minimum id: unions attach the larger root under the
    * smaller, so find(root) is the min of everything merged so far. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val idType = e.schema("src").dataType
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    e.select("src", "dst").toLocalIterator().forEachRemaining { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    val labels = parent.keysIterator.map(id => id -> find(id)).toArray
    val sizes = labels.groupMapReduce(_._2)(_ => 1L)(_ + _)
    val rows = labels.iterator
      .map { case (id, root) => Row(id, root, sizes(root)) }
      .toSeq
    val schema = StructType(Seq(
      StructField("id", idType), StructField("cluster_id", idType),
      StructField("cluster_size", LongType, nullable = false)))
    // parallelize the labeling back out so downstream joins stay
    // distributed (the label table may still be millions of rows)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(32, rows.size / 50000 + 1))), schema)
  }

  /** Distributed hash-min label propagation (see object doc). */
  private def propagate(e: DataFrame, maxIter: Int): DataFrame = {
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // the (src, dst=src) self-loop row's lbl IS src's previous label,
      // so the round's aggregate yields (new label, old label) together
      val next = e.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("lbl").as("lbl"),
          min(when(col("dst") === col("src"), col("lbl"))).as("__old"))
        .localCheckpoint(true)
      // cheap scan of checkpointed data; isEmpty short-circuits at the
      // first changed label
      converged = next.where(col("lbl") =!= col("__old")).isEmpty
      labels = next.drop("__old")
      iter += 1
    }
    // Silent split clusters are worse than a crash: a chain-shaped pair
    // set with diameter > maxIter would return multiple representatives
    // per duplicate family with no signal. Fail loudly so callers raise
    // maxIter instead of consuming wrong clusters.
    if (!converged)
      throw new IllegalStateException(
        s"Components.fromPairs did not converge within maxIter=$maxIter " +
          "rounds (component diameter exceeds maxIter); raise maxIter")
    labels.select(col("id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
  }
}
