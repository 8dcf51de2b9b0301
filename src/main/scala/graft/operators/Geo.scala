package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES geo surface — `geo_point`, `geo_bounding_box`, `geohash_grid`,
  * `geo_distance` sort — in EXACT integer space so every result is
  * engine-portable:
  *
  *  - points live as integer MICRODEGREES (the same fixed-point
  *    discipline the money columns use as cents);
  *  - the geohash is the real algorithm — alternating lon/lat bit
  *    interleave, base32 alphabet — computed with pure integer bit
  *    arithmetic (15 bits per axis = 6 chars), no floats anywhere;
  *  - distance ranks in squared-degree space (plate carrée on the
  *    sphere of the synthetic fixture): trig-free, so no libm
  *    divergence between engines. At production scale the ranking is
  *    what matters and any monotone distance works per-latitude-band;
  *    a haversine REPORT column would be the one float add-on.
  *
  * The synthetic tables carry no coordinates, so points derive from the
  * row key by the same Knuth-hash construction the diversified sampler
  * uses — deterministic, uniform, SQL-replayable.
  *
  * All of it is row-local codegen'd projection: the grid agg is ONE
  * shuffle on the cell key; the bounding-box filter prunes before any
  * shuffle. A 100 TB corpus with a real geo column would swap the
  * derivation for the column and keep every plan shape.
  */
object Geo {

  val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Deterministic synthetic point: Knuth multiplicative hash of the
    * key → lat ∈ [-90e6, 90e6), lon ∈ [-180e6, 180e6) microdegrees.
    *
    * The key is REDUCED mod the span before (and between) the
    * multiplications: `(key mod M)·C mod M ≡ key·C mod M` exactly
    * (M·C ≡ 0 mod M), so every emitted value is bit-identical to the
    * naive product form — but the intermediate stays ≤ M·C ≈ 9.6e17,
    * inside Long, where the naive `key·2654435761·31` overflowed (and
    * under Spark 4's default ANSI mode ABORTED the query) for keys
    * past ~1.1e8 — c_custkey territory at the scale this file's
    * header claims (round-13 review). */
  def latUdeg(key: Column): Column =
    pmod(pmod(key, lit(180000000L)) * 2654435761L,
      lit(180000000L)) - 90000000L
  def lonUdeg(key: Column): Column =
    pmod(pmod(pmod(key, lit(360000000L)) * 2654435761L,
      lit(360000000L)) * 31L + 7L, lit(360000000L)) - 180000000L

  /** 15 bits per axis: [0, span) microdegrees → [0, 32768) exactly.
    * Column `/` is double division; the numerator (≤ 5.9e12) is exact
    * in double and the true quotient is ≥ 1/span from any non-hit
    * integer, so floor equals the oracle's integer `//` bit-for-bit. */
  private def axisBits(udeg: Column, offset: Long, span: Long): Column =
    floor(((udeg + offset) * 32768L) / span).cast("long")

  /** The real geohash: interleave lon (even positions from the MSB) and
    * lat bits — 30 bits = 6 base32 chars. Pure integer shifts/adds in
    * one codegen'd expression. */
  def geohash6(lat: Column, lon: Column): Column = {
    val lonb = axisBits(lon, 180000000L, 360000000L)
    val latb = axisBits(lat, 90000000L, 180000000L)
    val inter = (0 until 15).map { i =>
      (shiftright(lonb, i) % 2) * lit(1L << (2 * i + 1)) +
        (shiftright(latb, i) % 2) * lit(1L << (2 * i))
    }.reduce(_ + _)
    val chars = base32.map(_.toString).toArray
    concat((0 until 6).map { c =>
      element_at(lit(chars),
        (shiftright(inter, 25 - 5 * c) % 32).cast("int") + 1)
    }: _*)
  }

  /** The DuckDB replay of [[geohash6]] over BIGINT lat/lon columns —
    * generated once, shared by every geo oracle. */
  def geohash6Sql(lat: String, lon: String): String = {
    val lonb = s"((($lon) + 180000000) * 32768) // 360000000"
    val latb = s"((($lat) + 90000000) * 32768) // 180000000"
    val inter = (0 until 15).map { i =>
      s"((($lonb) >> $i) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((($latb) >> $i) % 2) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")
    (0 until 6).map { c =>
      s"substring('$base32', ((($inter) >> ${25 - 5 * c}) % 32)::INT + 1, 1)"
    }.mkString(" || ")
  }

  /** geo_bounding_box + geohash_grid: points inside the box, bucketed
    * by geohash prefix (ES `precision`), top cells by doc count. */
  def geohashGrid(df: DataFrame, key: Column, precision: Int = 2,
                  k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lat = latUdeg(key)
    val lon = lonUdeg(key)
    df.select(lat.as("lat"), lon.as("lon"))
      .filter(col("lat").between(-45000000L, 45000000L) &&
        col("lon").between(-90000000L, 90000000L))
      .select(substring(geohash6(col("lat"), col("lon")), 1, precision)
        .as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("cell"))))
      .filter(col("rk") <= k)
      .select(col("cell"), col("n"), col("rk").cast("long").as("rk"))
  }

  /** geo_distance: squared-degree distance from an origin, range
    * filter + nearest-k sort — exact integer microdegrees². */
  def nearest(df: DataFrame, key: Column, idCol: Column,
              originLatU: Long = 0L, originLonU: Long = 0L,
              radiusUdeg: Long = 20000000L, k: Int = 20): DataFrame = {
    val lat = latUdeg(key)
    val lon = lonUdeg(key)
    val d2 = (lat - originLatU) * (lat - originLatU) +
      (lon - originLonU) * (lon - originLonU)
    df.select(idCol.as("id"), lat.as("lat"), lon.as("lon"), d2.as("d2"))
      .filter(col("d2") <= radiusUdeg * radiusUdeg)
      .orderBy(col("d2").asc, col("id").asc)
      .limit(k)
      .select(col("id"), col("lat"), col("lon"), col("d2"))
  }
}
