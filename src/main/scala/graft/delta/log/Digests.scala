package graft.delta.log

/** Shared SHA-256 helpers: commit-memo identity (CommitWriter) and
  * fixture-drop signatures (DeltaQueries / EventsStream) use one
  * implementation instead of drifting copies. */
private[graft] object Digests {

  def sha256Hex(bytes: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(bytes))

  /** Streaming digest of a local file (never loads it whole). */
  def sha256HexOf(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = new java.io.FileInputStream(f)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    hex(md.digest())
  }

  private def hex(d: Array[Byte]): String = d.map("%02x".format(_)).mkString
}
