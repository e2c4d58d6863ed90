package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 source/format operators: semi-structured columns inside
  * columnar tables. (Parquet scan pushdown is exercised by every other
  * op and asserted in PlanSpec; CSV/JSON file round-trips are spec-only
  * since the driver's tables are parquet.)
  */
object Sources {

  /** JSON column extraction: events.props is a JSON string; pull typed
    * fields out with a codegen'd path expression (no UDF). At scale this
    * is the schema-on-read pattern for raw event feeds.
    */
  val jsonExtract: Op = Op(
    "q_json_extract",
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      |  event_type
      |FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50""".stripMargin,
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"))
      .filter(col("k") >= 50)
  }

  /** from_json with an explicit schema into a struct, then flattened —
    * the typed variant of jsonExtract.
    */
  val jsonStruct: Op = Op(
    "q_json_struct",
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin,
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
  }

  val ops: Seq[Op] = Seq(jsonExtract, jsonStruct)
}
