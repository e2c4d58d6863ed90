package graft

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted inside operator builders so harnesses that
  * run many queries in one session (Verify, Bench, the driver) can release
  * cached blocks between queries instead of leaning on LRU eviction.
  *
  * Operators call [[track]] where they would call `.persist()`; a harness
  * calls [[drain]] after materializing each query's result. A library user
  * composing one pipeline can ignore this entirely — the persisted data
  * stays hot for the lifetime of their job, which is the normal Spark
  * contract.
  */
object CacheRegistry {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** persist() + remember for the next drain(). */
  def track(df: DataFrame): DataFrame = synchronized {
    live += df
    df.persist()
  }

  /** [[track]] at an explicit storage level — DISK_ONLY callers
    * materialize a shared stage once without taking storage-memory
    * away from execution (the shuffle-file discipline, spelled out). */
  def track(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    synchronized {
      live += df
      df.persist(level)
    }

  /** Remember an already-persisted DataFrame for the next drain(). */
  def register(df: DataFrame): DataFrame = synchronized {
    live += df
    df
  }

  /** Number of currently tracked caches (spec hook: ops that claim to be
    * cache-free can pin it at zero). */
  def liveCount: Int = synchronized(live.size)

  def drain(): Unit = drain(blocking = false)

  /** `blocking = true` waits for block removal — the measurement-harness
    * form: leftover storage blocks from a previous query otherwise
    * starve the next query's execution memory mid-run (unified memory
    * eviction churn → aggregation spills charged to the wrong op).
    */
  def drain(blocking: Boolean): Unit = synchronized {
    live.foreach(_.unpersist(blocking))
    live.clear()
  }
}
