package graft.api

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Typed schema for the TPC-H-ish tables — the reference's queries are
  * statically typed over case-class-like schemas (tests/PaperTutorial
  * schema.Book etc.); Dataset[T] with implicit product encoders is the
  * Spark-native equivalent. Typed loaders sit beside the DataFrame
  * loaders in [[graft.Tables]]; lambda-free column ops still apply when
  * codegen matters, typed lambdas when compile-time safety matters.
  */
object Schema {

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }
  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir).as[Customer]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
