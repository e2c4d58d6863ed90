package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan inspection: print the formatted physical plan of one operator
  * (or all, with no args) at sf0.001 — the .explain("formatted") loop the
  * scale review runs per operator.
  *
  * Usage: runMain graft.Explain [opName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          println(fn(spark, dir).queryExecution.explainString(FormattedMode))
        case None => System.err.println(s"unknown op: $name")
      }
    }
    spark.stop()
  }
}
