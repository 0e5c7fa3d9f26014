package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.GraftFrame
import scala.collection.mutable

/** Materialized-view registry + query cache (reference
  * src/features/cashandview.rs: MATERIALIZED_VIEW_MANAGER max 50 views with
  * TTL, QueryCache 100 entries / 3600 s).
  *
  * Spark-side: a "materialized" view is a persisted (MEMORY_AND_DISK)
  * DataFrame pinned with a count — distributed, spillable, never collected
  * to the driver (the reference stores Arrow batches in process memory,
  * which caps at single-node RAM — SURVEY §4.1).
  */
object MaterializedViews {
  final case class View(name: String, definitionSql: String, df: DataFrame,
      createdAtMs: Long, ttlSecs: Option[Long])

  val MaxViews = 50
  private val views = mutable.LinkedHashMap.empty[String, View]

  def create(frame: GraftFrame, name: String, ttlSecs: Option[Long] = None): View =
    synchronized {
      require(views.size < MaxViews || views.contains(name),
        s"materialized view limit ($MaxViews) reached")
      drop(name)
      val df = frame.toDF.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // pin now — view must not see later source mutations
      df.createOrReplaceTempView(name)
      val v = View(name, frame.sqlText, df, System.currentTimeMillis(), ttlSecs)
      views(name) = v
      v
    }

  def get(name: String): Option[GraftFrame] = synchronized {
    views.get(name).flatMap { v =>
      if (expired(v)) { drop(name); None }
      else Some(GraftFrame(v.df, name))
    }
  }

  def refresh(frame: GraftFrame, name: String): View = synchronized {
    val ttl = views.get(name).flatMap(_.ttlSecs)
    create(frame, name, ttl)
  }

  def drop(name: String): Unit = synchronized {
    views.remove(name).foreach(_.df.unpersist())
  }

  def list(): Seq[(String, Long, Option[Long])] = synchronized {
    views.values.map(v => (v.name, v.createdAtMs, v.ttlSecs)).toSeq
  }

  def clear(): Unit = synchronized { views.keys.toSeq.foreach(drop) }

  private def expired(v: View): Boolean =
    v.ttlSecs.exists(t => System.currentTimeMillis() - v.createdAtMs > t * 1000)
}

/** Plan-text-keyed query cache (reference QueryCache: exact-SQL-hash →
  * batches). Key = the generated SQL text; value = persisted DataFrame.
  * LRU eviction at maxEntries, TTL per entry.
  */
class QueryCache(maxEntries: Int = 100, ttlSecs: Long = 3600) {
  private case class Entry(df: DataFrame, at: Long)
  private val entries = mutable.LinkedHashMap.empty[String, Entry]

  def stats: (Int, Long) = synchronized { (entries.size, hits) }
  private var hits = 0L

  /** Run-with-cache: returns the cached pinned result for an identical
    * generated query, else executes, pins, caches (reference
    * elusion_with_cache, src/elusion.rs:554-618).
    */
  def elusionWithCache(frame: GraftFrame, alias: String): GraftFrame =
    synchronized {
      val key = frame.sqlText
      val now = System.currentTimeMillis()
      entries.get(key) match {
        case Some(e) if now - e.at <= ttlSecs * 1000 =>
          hits += 1
          entries.remove(key); entries(key) = e // LRU touch
          e.df.createOrReplaceTempView(alias)
          GraftFrame(e.df, alias)
        case _ =>
          entries.remove(key).foreach(_.df.unpersist())
          val df = frame.toDF.persist(StorageLevel.MEMORY_AND_DISK)
          df.count()
          while (entries.size >= maxEntries) {
            val oldest = entries.head._1
            entries.remove(oldest).foreach(_.df.unpersist())
          }
          entries(key) = Entry(df, now)
          df.createOrReplaceTempView(alias)
          GraftFrame(df, alias)
      }
    }

  def invalidate(): Unit = synchronized {
    entries.values.foreach(_.df.unpersist())
    entries.clear()
  }
}

object QueryCache {
  /** Process-global default cache, mirroring the reference's global. */
  lazy val global = new QueryCache()
}
