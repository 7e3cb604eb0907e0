package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The sync pipeline's logical plan (`Sync Job/sync.py:48-58`, SURVEY.md
  * §3.1): flatten project nodes (T1), keep source nodes (T2), build the
  * per-node sync URL (T3). The side-effecting POST fan-out is
  * [[graft.sinks.HttpSink]].
  */
object SyncPlanner {

  /** Source-node sync URLs for a nodes table (already flattened to rows).
    *
    * T2 caveat (SURVEY.md §2.2): the reference's Python `!=` is true for
    * `None != "next"`, while Spark `=!=` is NULL for NULL input (row
    * dropped) — `coalesce` preserves reference semantics for NULL `type`.
    */
  def sourceSyncUrls(nodes: DataFrame, baseUrl: String): DataFrame =
    nodes
      .filter(coalesce(col("type"), lit("")) =!= "next")
      .select(
        col("project_id"), col("seq"), col("id").as("node_id"),
        concat(lit(baseUrl), col("id"), lit("/sync")).as("url"))
      .orderBy("seq")
}
