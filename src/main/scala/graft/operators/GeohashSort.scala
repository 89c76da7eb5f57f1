package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geometry.Geom

/** Geohash-clustered write order (SURVEY.md §2 K5; reference
  * postgis.go:365-432 `CREATE INDEX … ST_GeoHash` + `CLUSTER`).
  *
  * The reference clusters PostGIS tables by geohash so spatially-near rows
  * share disk pages. Engine-side the same effect is an ORDER BY geohash
  * before the write — with range partitioning this also becomes the
  * spatial partitioning scheme at 100 TB (near things land in the same
  * parquet files, so bbox queries prune).
  */
object GeohashSort {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of a WGS84 point. */
  def encode(lon: Double, lat: Double, precision: Int = 12): String = {
    var latLo = -90.0
    var latHi = 90.0
    var lonLo = -180.0
    var lonHi = 180.0
    val sb = new StringBuilder(precision)
    var bit = 0
    var ch = 0
    var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) {
        sb.append(Base32.charAt(ch))
        bit = 0
        ch = 0
      }
    }
    sb.toString
  }

  /** Geohash of a WKB geometry's centroid (merc -> wgs), "" for null. */
  val geohashUdf = udf { (wkb: Array[Byte]) =>
    val g = Geom.fromWkb(wkb)
    if (g == null || g.isEmpty) ""
    else {
      val c = g.getCentroid
      val (lon, lat) = Geom.mercToWgs(c.getX, c.getY)
      if (lon.isNaN || lat.isNaN || math.abs(lon) > 180 || math.abs(lat) > 90) ""
      else encode(lon, lat)
    }
  }

  /** Cluster a table by geometry locality before writing (K5). */
  def clustered(df: DataFrame, geomCol: String = "geometry"): DataFrame =
    df.orderBy(geohashUdf(col(geomCol)))
}
