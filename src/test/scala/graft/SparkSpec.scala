package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sfTiny = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session shared across suites in one JVM; don't stop it per-suite
    super.afterAll()
  }

  /** Write rows as a parquet table layout Tables.load understands, so ops
    * can be driven on synthetic inputs through their public signature.
    */
  def writeTable(dir: String, name: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_spec").toString
}
