package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Row-level security + column masking as a VIEW REWRITE — the Unity
  * Catalog / Snowflake row-access-policy shape: a policy is nothing but a
  * filter plus a masking projection bound to the table, applied before any
  * user expression sees a row. Because both pieces are ordinary Catalyst
  * expressions, the engine keeps every optimization: the row predicate
  * pushes into the parquet scan (PushedFilters), untouched columns prune
  * away (ReadSchema), and masks ride whole-stage codegen — governance with
  * ZERO new physical operators, which is exactly why the view-rewrite
  * design wins at 100 TB over post-hoc result filtering (the filter runs
  * before I/O amplification, not after).
  */
object Policy {

  /** Apply a row-access policy and per-column masks to `df`. Masks replace
    * the named columns IN PLACE (same name, same position), so downstream
    * code — and the user — cannot tell a masked view from the raw table by
    * schema; rows failing `rowFilter` simply do not exist for this
    * principal. */
  def secureView(df: DataFrame, rowFilter: Column,
      masks: Seq[(String, Column)]): DataFrame = {
    val m = masks.toMap
    df.filter(rowFilter)
      .select(df.columns.toSeq.map(c => m.get(c).map(_.as(c)).getOrElse(col(c))): _*)
  }
}
