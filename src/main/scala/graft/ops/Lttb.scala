package graft.ops

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson, "Downsampling
  * Time Series for Visual Representation", U. Iceland 2013) — the
  * observability-standard series reducer (Grafana's default): per bucket,
  * keep the point spanning the largest triangle with the previously KEPT
  * point and the NEXT bucket's centroid, so extremes and inflections
  * survive where naive striding or averaging erase them.
  *
  * Pure integer arithmetic end to end: x is rebased to the series origin
  * before any multiplication, the centroid division is cleared by
  * multiplying the area comparison through by the next bucket's point
  * count, and the cross products ride BigInt so no input magnitude can
  * overflow. Ties keep the earliest candidate — fully deterministic.
  */
object Lttb {

  /** Downsample `pts` (MUST be sorted by x, distinct x) to `t` points.
    * Returns all points when n ≤ t; otherwise the first point, one point
    * per interior bucket, and the last point — t in total. */
  def select(pts: Array[(Long, Long)], t: Int): Seq[(Long, Long)] = {
    val n = pts.length
    require(t >= 3, s"LTTB needs >= 3 output points, got $t")
    if (n <= t) return pts.toSeq
    val x0 = pts(0)._1
    val xs = pts.map(_._1 - x0)
    val ys = pts.map(_._2)
    val m = t - 2 // interior buckets over indices 1 .. n-2
    def lo(i: Int): Int = ((i.toLong * (n - 2)) / m).toInt + 1
    val kept = scala.collection.mutable.ArrayBuffer(0)
    var prev = 0
    var i = 0
    while (i < m) {
      val bLo = lo(i); val bHi = lo(i + 1)
      val (nLo, nHi) = if (i + 1 < m) (lo(i + 1), lo(i + 2)) else (n - 1, n)
      var sx = 0L; var sy = 0L
      var j = nLo
      while (j < nHi) { sx += xs(j); sy += ys(j); j += 1 }
      val c = (nHi - nLo).toLong
      val px = BigInt(xs(prev)); val py = BigInt(ys(prev))
      var best = bLo
      var bestArea = BigInt(-1)
      j = bLo
      while (j < bHi) {
        // 2·area·c of (prevKept, candidate, nextCentroid) — division-free
        val area = ((px * c - sx) * (BigInt(ys(j)) - py)
          - (px - xs(j)) * (BigInt(sy) - py * c)).abs
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      kept += best
      prev = best
      i += 1
    }
    kept += n - 1
    kept.map(pts(_)).toSeq
  }
}
