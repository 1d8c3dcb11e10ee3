package graft.delta.scan

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.delta.log.Actions.DeletionVectorDescriptor

/** Deletion-vector support: Z85 codec + the Delta RoaringBitmapArray
  * "portable" binary format (magic 1681511377), per the public Delta
  * protocol spec (delta-io/delta PROTOCOL.md, "Deletion Vector Format").
  *
  * The reference turns each file's DV into a row-level parquet access
  * plan (reference: crates/datafusion/src/table_provider/delta/
  * mod.rs:244-325). Spark has no public access-plan API, so the scan
  * filters on `_metadata.row_index` membership instead (SURVEY.md §4
  * row "DV row-level skipping").
  */
object DvBitmap {

  final val Magic: Int = 1681511377

  /** A deserialized RoaringBitmapArray: one 32-bit roaring bitmap per
    * 2^32 span of row indexes. Serializable so the scan can close over
    * a Map[file -> bitmap] in a filter function. */
  final class Bitmap(val bitmaps: Array[Roaring32]) extends Serializable {
    def contains(rowIndex: Long): Boolean = {
      val high = (rowIndex >>> 32).toInt
      high < bitmaps.length && bitmaps(high) != null &&
        bitmaps(high).contains((rowIndex & 0xFFFFFFFFL).toInt)
    }
    def cardinality: Long = bitmaps.filter(_ != null).map(_.cardinality.toLong).sum
    /** All deleted row indexes, ascending (small-DV anti-join path). */
    def iterator: Iterator[Long] =
      bitmaps.iterator.zipWithIndex.flatMap { case (bm, high) =>
        if (bm == null) Iterator.empty
        else bm.iterator.map(v => (high.toLong << 32) | (v.toLong & 0xFFFFFFFFL))
      }
  }

  /** One 32-bit roaring bitmap: container key -> container. */
  final class Roaring32(
      val keys: Array[Short],
      val containers: Array[Container]) extends Serializable {
    def contains(value: Int): Boolean = {
      val high = (value >>> 16).toShort
      val low = value & 0xFFFF
      var i = 0
      while (i < keys.length) {
        if (keys(i) == high) return containers(i).contains(low)
        i += 1
      }
      false
    }
    def cardinality: Int = containers.map(_.cardinality).sum
    def iterator: Iterator[Int] =
      keys.iterator.zip(containers.iterator).flatMap { case (k, c) =>
        c.iterator.map(low => ((k & 0xFFFF) << 16) | low)
      }
  }

  sealed trait Container extends Serializable {
    def contains(low: Int): Boolean
    def cardinality: Int
    /** Set low-16-bit values, ascending. */
    def iterator: Iterator[Int]
  }
  final case class ArrayContainer(values: Array[Short]) extends Container {
    def contains(low: Int): Boolean = {
      // values are sorted unsigned shorts
      var lo = 0; var hi = values.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = values(mid) & 0xFFFF
        if (v == low) return true
        else if (v < low) lo = mid + 1
        else hi = mid - 1
      }
      false
    }
    def cardinality: Int = values.length
    def iterator: Iterator[Int] = values.iterator.map(_ & 0xFFFF)
  }
  final case class BitmapContainer(words: Array[Long]) extends Container {
    def contains(low: Int): Boolean =
      (words(low >>> 6) & (1L << (low & 63))) != 0
    def cardinality: Int = words.map(java.lang.Long.bitCount).sum
    def iterator: Iterator[Int] =
      words.iterator.zipWithIndex.flatMap { case (w, wi) =>
        Iterator.range(0, 64).filter(b => (w & (1L << b)) != 0)
          .map(b => (wi << 6) | b)
      }
  }
  final case class RunContainer(starts: Array[Short], lengths: Array[Short])
      extends Container {
    def contains(low: Int): Boolean = {
      var i = 0
      while (i < starts.length) {
        val s = starts(i) & 0xFFFF
        if (low >= s && low <= s + (lengths(i) & 0xFFFF)) return true
        i += 1
      }
      false
    }
    def cardinality: Int =
      lengths.map(l => (l & 0xFFFF) + 1).sum
    def iterator: Iterator[Int] =
      starts.indices.iterator.flatMap { i =>
        val s = starts(i) & 0xFFFF
        Iterator.range(s, s + (lengths(i) & 0xFFFF) + 1)
      }
  }

  // ---- portable-format decode ---------------------------------------

  /** Decode the RoaringBitmapArray portable serialization:
    * [magic int32 LE][nBitmaps int64 LE][each: 32-bit roaring portable]. */
  def deserialize(bytes: Array[Byte]): Bitmap = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"Bad DV magic $magic (expected $Magic)")
    val n = buf.getLong
    require(n >= 0 && n < Int.MaxValue, s"Bad bitmap count $n")
    val bitmaps = new Array[Roaring32](n.toInt)
    var i = 0
    while (i < n) {
      bitmaps(i) = readRoaring32(buf)
      i += 1
    }
    new Bitmap(bitmaps)
  }

  private final val SerialCookieNoRuns = 12346
  private final val SerialCookie = 12347
  private final val NoOffsetThreshold = 4

  private def readRoaring32(buf: ByteBuffer): Roaring32 = {
    val cookie = buf.getInt
    val hasRuns = (cookie & 0xFFFF) == SerialCookie
    val size =
      if (hasRuns) (cookie >>> 16) + 1
      else {
        require((cookie & 0xFFFF) == SerialCookieNoRuns,
          s"Bad roaring cookie ${cookie & 0xFFFF}")
        buf.getInt
      }
    val runFlags = new Array[Boolean](size)
    if (hasRuns) {
      val bitmapBytes = new Array[Byte]((size + 7) / 8)
      buf.get(bitmapBytes)
      var i = 0
      while (i < size) {
        runFlags(i) = (bitmapBytes(i / 8) & (1 << (i % 8))) != 0
        i += 1
      }
    }
    val keys = new Array[Short](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    // offset header present when: no runs, or size >= threshold
    if (!hasRuns || size >= NoOffsetThreshold) {
      var j = 0
      while (j < size) { buf.getInt; j += 1 } // offsets unused (sequential read)
    }
    val containers = new Array[Container](size)
    i = 0
    while (i < size) {
      containers(i) =
        if (runFlags(i)) {
          val nRuns = buf.getShort & 0xFFFF
          val starts = new Array[Short](nRuns)
          val lens = new Array[Short](nRuns)
          var r = 0
          while (r < nRuns) {
            starts(r) = buf.getShort; lens(r) = buf.getShort; r += 1
          }
          RunContainer(starts, lens)
        } else if (cards(i) > 4096) {
          val words = new Array[Long](1024)
          var w = 0
          while (w < 1024) { words(w) = buf.getLong; w += 1 }
          BitmapContainer(words)
        } else {
          val values = new Array[Short](cards(i))
          var v = 0
          while (v < cards(i)) { values(v) = buf.getShort; v += 1 }
          ArrayContainer(values)
        }
      i += 1
    }
    new Roaring32(keys, containers)
  }

  // ---- encode -------------------------------------------------------

  /** Serialize a sorted set of row indexes (all < 2^32 per bitmap span)
    * into the portable format. Containers follow the roaring rule the
    * decoder expects: cardinality <= 4096 → sorted 16-bit array,
    * > 4096 → 1024-word bitmap (8 KiB) — so a DV can mark ANY row set,
    * including dense deletes of a whole file region. */
  def serialize(rowIndexes: Seq[Long]): Array[Byte] = {
    require(rowIndexes.nonEmpty, "empty DV")
    val byHigh = rowIndexes.sorted.groupBy(i => (i >>> 32).toInt)
    val maxHigh = byHigh.keys.max
    val out = new java.io.ByteArrayOutputStream()
    def writeLE(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def writeLEShort(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def writeLELong(v: Long): Unit = { writeLE(v.toInt); writeLE((v >>> 32).toInt) }
    writeLE(Magic)
    writeLE(maxHigh + 1); writeLE(0) // int64 LE count
    for (h <- 0 to maxHigh) {
      val vals = byHigh.getOrElse(h, Seq.empty).map(i => (i & 0xFFFFFFFFL).toInt)
      val byKey = vals.groupBy(v => (v >>> 16)).toSeq.sortBy(_._1)
      writeLE(SerialCookieNoRuns)
      writeLE(byKey.size)
      for ((k, vs) <- byKey) { writeLEShort(k); writeLEShort(vs.size - 1) }
      var off = 4 + 4 + byKey.size * 4 + byKey.size * 4
      for ((_, vs) <- byKey) {
        writeLE(off)
        off += (if (vs.size > 4096) 8192 else vs.size * 2)
      }
      for ((_, vs) <- byKey) {
        if (vs.size > 4096) {
          val words = new Array[Long](1024)
          for (v <- vs) {
            val low = v & 0xFFFF
            words(low >>> 6) |= (1L << (low & 63))
          }
          words.foreach(writeLELong)
        } else vs.sorted.foreach(v => writeLEShort(v & 0xFFFF))
      }
    }
    out.toByteArray
  }

  // ---- Z85 codec ----------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 requires length % 4 == 0")
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFF); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 requires length % 5 == 0, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Decode(s.charAt(i + j).toInt)
        require(d >= 0, s"bad z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >> 24) & 0xFF).toByte
      out(o + 1) = ((v >> 16) & 0xFF).toByte
      out(o + 2) = ((v >> 8) & 0xFF).toByte
      out(o + 3) = (v & 0xFF).toByte
      i += 5; o += 4
    }
    out
  }

  // ---- descriptor resolution ----------------------------------------

  /** Absolute path of an on-disk DV ("u" storage: <prefix>/deletion_vector_<uuid>.bin). */
  def dvPath(tablePath: Path, dv: DeletionVectorDescriptor): Path =
    dv.storageType match {
      case "p" => new Path(dv.pathOrInlineDv)
      case "u" =>
        val encoded = dv.pathOrInlineDv
        val prefix = encoded.dropRight(20)
        val uuidBytes = z85Decode(encoded.takeRight(20))
        val bb = ByteBuffer.wrap(uuidBytes)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        val name = s"deletion_vector_$uuid.bin"
        if (prefix.isEmpty) new Path(tablePath, name)
        else new Path(new Path(tablePath, prefix), name)
      case other =>
        throw new IllegalArgumentException(s"Unexpected DV storageType '$other'")
    }

  /** Load + decode a descriptor ("i" inline / "u" relative / "p" absolute). */
  def load(fs: FileSystem, tablePath: Path,
      dv: DeletionVectorDescriptor): Bitmap =
    dv.storageType match {
      case "i" => deserialize(z85Decode(dv.pathOrInlineDv))
      case _ =>
        val p = dvPath(tablePath, dv)
        val in = fs.open(p)
        try {
          val offset = dv.offset.getOrElse(0)
          in.seek(offset.toLong)
          // entry layout: [size int32 BE][data][crc32 int32 BE]
          val size = in.readInt()
          require(size == dv.sizeInBytes,
            s"DV size mismatch: entry=$size descriptor=${dv.sizeInBytes}")
          val data = new Array[Byte](size)
          in.readFully(data)
          deserialize(data)
        } finally in.close()
    }

  /** Write a DV file holding ONE bitmap: returns the descriptor
    * ("u" storage). */
  def writeDvFile(fs: FileSystem, tablePath: Path,
      rowIndexes: Seq[Long]): DeletionVectorDescriptor =
    writeDvFilePacked(fs, tablePath, Seq(rowIndexes)).head

  /** Pack MANY bitmaps into ONE DV file (entries at increasing
    * offsets, per the DV file layout: version byte, then per entry
    * [size int32 BE][roaring data][crc32 int32 BE]). Returns one "u"
    * descriptor per input, in order, all sharing the file's UUID.
    * This is the shape a distributed DELETE wants: one DV file per
    * write task, not one per data file — a DELETE touching 10⁴ files
    * in a task adds one object, not 10⁴ tiny ones. */
  def writeDvFilePacked(fs: FileSystem, tablePath: Path,
      perFile: Seq[Seq[Long]]): Seq[DeletionVectorDescriptor] = {
    require(perFile.nonEmpty, "writeDvFilePacked needs at least one entry")
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val encodedUuid = z85Encode(bb.array())
    val name = s"deletion_vector_$uuid.bin"
    val p = new Path(tablePath, name)
    val out = fs.create(p, false)
    val descriptors = Seq.newBuilder[DeletionVectorDescriptor]
    try {
      out.write(1) // DV file format version
      var offset = 1
      for (rowIndexes <- perFile) {
        val data = serialize(rowIndexes)
        out.writeInt(data.length)
        out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        out.writeInt(crc.getValue.toInt)
        descriptors += DeletionVectorDescriptor("u", encodedUuid,
          Some(offset), data.length, rowIndexes.size.toLong)
        offset += 4 + data.length + 4
      }
    } finally out.close()
    descriptors.result()
  }
}
