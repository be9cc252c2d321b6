package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` facade over the core tables — compile-time field
  * checks for pipeline code that benefits from them (the DataFrame
  * loaders in [[Tables]] remain the dynamic-schema path). Encoders
  * come from the case classes; columnar reads and pushdown behave
  * identically to the DataFrame API.
  */
object Typed {
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  def events(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._
    Tables.events(s, d).as[Event]
  }
  def documents(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._
    Tables.documents(s, d).as[Document]
  }
  def embeddings(s: SparkSession, d: String): Dataset[Embedding] = {
    import s.implicits._
    Tables.embeddings(s, d).as[Embedding]
  }
  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d).as[Order]
  }

  /** Register every test table as a temp view so the whole engine is
    * reachable through `spark.sql` — the reference's users write
    * BigQuery SQL; this is their migration surface.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(s, d, t).createOrReplaceTempView(t)
    } // events goes through its ns-normalizing loader
  def registerAllViews(s: SparkSession, d: String): Unit = {
    registerViews(s, d)
    Tables.events(s, d).createOrReplaceTempView("events")
  }
}
