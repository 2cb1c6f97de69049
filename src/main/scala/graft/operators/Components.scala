package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the clustering
  * step that turns near-duplicate PAIRS (minhash/simhash/jaccard output)
  * into duplicate GROUPS, so a pipeline can keep one representative per
  * cluster instead of dropping only directly-linked copies.
  *
  * Algorithm: hash-min label propagation. Each node starts labeled with
  * its own id; every round each node takes the min label in its closed
  * neighborhood. Converges in O(component diameter) rounds — near-dup
  * clusters are dense and shallow (diameter ≤ ~3 in practice), so this
  * terminates in a handful of rounds even when the corpus is 100 TB; the
  * per-round cost is one equi-join + one groupBy on node id (both
  * hash-partitioned, no broadcast of anything unbounded). Lineage is cut
  * per round (localCheckpoint here; durable checkpoint on a cluster) so
  * the plan does not grow with iteration count, same discipline as
  * $graphLookup's BFS.
  */
object Components {
  /** @return (id, cluster_id, cluster_size) for every node appearing in
    * `pairs`; cluster_id = min node id in the component. */
  def fromPairs(pairs: DataFrame, aCol: String, bCol: String,
                maxIter: Int = 25): DataFrame = {
    // undirected edge list + self-loops (self-loop keeps a node's own
    // label in the min() so labels never regress). Built with ONE scan
    // of `pairs` — a 4-way union would re-evaluate the upstream pair
    // plan (typically an expensive near-dup query) once per branch
    // before the persist materializes.
    val e = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")),
        struct(col(aCol).as("src"), col(aCol).as("dst")),
        struct(col(bCol).as("src"), col(bCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    // Convergence = no label changed this round. Checked with an
    // id-equi-join against the previous labels and an isEmpty (take(1),
    // short-circuits) on the changed set — works for ANY orderable id
    // type (string/UUID doc ids included), unlike a numeric-sum check
    // which would cast non-numeric ids to null and NPE. The node set is
    // identical across rounds (every src appears every round via its
    // self-loop), so the inner join is total.
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = e.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      converged = next
        .join(labels.withColumnRenamed("lbl", "prevLbl"), "id")
        .where(col("lbl") =!= col("prevLbl"))
        .isEmpty
      labels = next
      iter += 1
    }
    e.unpersist()
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
