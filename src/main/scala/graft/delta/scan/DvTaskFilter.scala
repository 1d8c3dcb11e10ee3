package graft.delta.scan

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import graft.delta.log.Actions.DeletionVectorDescriptor

/** Executor-side deletion-vector decoding for the large-DV scan path.
  *
  * The driver ships only DESCRIPTORS (path/offset/size — bytes per
  * file, not bitmaps); each task lazily loads and decodes the DVs of
  * exactly the files it reads, through a per-JVM cache bounded by
  * decoded-bytes budget. This bounds driver memory by O(files) instead
  * of O(sum of bitmap bytes): a scan touching thousands of heavy-DV
  * files never concentrates their bitmaps in driver heap — the same
  * executor-side placement production Delta readers use. Inline ("i")
  * DVs decode from the descriptor itself and never touch storage.
  */
object DvTaskFilter {

  /** Hadoop Configuration is not Java-serializable; standard
    * Writable-based wrapper so task closures can carry it. */
  final class SerHadoopConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Per-JVM decoded-bitmap cache, LRU by total APPROXIMATE decoded
    * bytes (the serialized DV size is the right order for roaring).
    * Tasks for the same file share one decode per executor; eviction
    * keeps a long-running executor's footprint bounded no matter how
    * many heavy-DV files its lifetime touches. */
  private val DefaultBudgetBytes = 256L * 1024 * 1024
  private val cacheBudget =
    new java.util.concurrent.atomic.AtomicLong(DefaultBudgetBytes)
  private[graft] def setBudgetForTest(b: Long): Unit = cacheBudget.set(b)
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cache = new java.util.LinkedHashMap[
      String, (DvBitmap.Bitmap, Long)](64, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, (DvBitmap.Bitmap, Long)]): Boolean =
      if (cacheBytes.get() > cacheBudget.get() && size() > 1) {
        cacheBytes.addAndGet(-e.getValue._2); true
      } else false
  }
  /** Test observability: decodes performed by this JVM. */
  private[graft] val decodeCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def cached(key: String, sizeHint: Long)(
      load: => DvBitmap.Bitmap): DvBitmap.Bitmap = cache.synchronized {
    val hit = cache.get(key)
    if (hit != null) hit._1
    else {
      val bm = load
      decodeCount.incrementAndGet()
      cacheBytes.addAndGet(sizeHint)
      cache.put(key, (bm, sizeHint)) // triggers LRU eviction check
      bm
    }
  }

  /** The per-row keep function for the scan's DV mask: true when the
    * row at (normalized file key, row index) is NOT deleted. Built on
    * the driver, evaluated in tasks; `descriptors` and `conf` arrive
    * via the closure (broadcast by Spark's task serialization — the
    * map holds descriptors only, never bitmaps). */
  def keepFunc(tableUri: String,
      descriptors: Map[String, DeletionVectorDescriptor],
      conf: SerHadoopConf): (String, Long) => Boolean = {
    (fkey: String, rowIndex: Long) =>
      descriptors.get(fkey) match {
        case None => true
        case Some(d) =>
          val bm = cached(s"$tableUri#${d.uniqueId}",
            math.max(d.sizeInBytes.toLong, 64L)) {
            val table = new Path(new java.net.URI(tableUri))
            // "i" inline decodes from the descriptor; fs is only
            // dereferenced for on-disk storage types
            val fs = table.getFileSystem(conf.conf)
            DvBitmap.load(fs, table, d)
          }
          !bm.contains(rowIndex)
      }
  }
}
