package graft.operators

/** Hilbert space-filling-curve mapping between n-dimensional bucket
  * coordinates and a 1-D curve position (Skilling's transpose
  * algorithm — John Skilling, "Programming the Hilbert curve", AIP
  * Conf. Proc. 707, 2004; public domain technique, implemented from
  * the paper's description).
  *
  * Why it exists next to Z-ORDER: both linearize multi-column layouts
  * for OPTIMIZE, but Z-order's bit interleave makes long jumps at
  * power-of-two boundaries (the curve teleports across the space, so
  * a file's bounding box in each dimension can span far more than its
  * row count suggests). The Hilbert curve is CONTINUOUS — consecutive
  * positions are always adjacent cells — so equal-size runs of the
  * sorted curve tile the space into tighter bounding boxes, i.e.
  * min/max stats per file cover smaller ranges and skipping prunes
  * more files for the same multi-column range predicate. At 100 TB
  * the layout pass costs the same one range-partitioned sort either
  * way; the skipping benefit is permanent. delta-spark's liquid
  * clustering made the same zorder→hilbert move.
  */
object HilbertCurve {

  /** Curve position of `coords` (each in [0, 2^bits)) on the n-dim
    * Hilbert curve. n*bits must fit a positive Long (<= 62). The
    * input array is not modified. */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"hilbert: need 1 <= n*bits <= 62, got n=$n bits=$bits")
    val x = java.util.Arrays.copyOf(coords, n)
    // AxesToTranspose: inverse-undo then Gray-encode, in place
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert low bits of x(0)
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed form, x(0) most significant per plane
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        out = (out << 1) | ((x(i) >> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** Inverse of [[index]] — coordinates of curve position `d`. Used by
    * the spec to prove bijectivity and step-adjacency; not on any
    * production path. */
  def coords(d: Long, bits: Int, n: Int): Array[Long] = {
    // de-interleave into the transposed form
    val x = new Array[Long](n)
    var pos = n * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        x(i) |= ((d >> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    // TransposeToAxes: Gray-decode then undo excess work, in place
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    var q = 2L
    val m = 1L << (bits - 1)
    while (q != m << 1) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    x
  }
}
