package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo helper functions (reference surface F1-F6,
  * `common/utils/GeoUtils.java:26-234` — itself the Apache-licensed Flink
  * training GeoUtils). All scalar functions are pure Column expressions
  * (codegen'd); only the path rasterization (F3) is procedural and uses a
  * UDF, exactly as the survey's custom-vs-builtin table prescribes.
  *
  * Coordinates are doubles (the reference stores floats and widens for
  * math; see SURVEY §1.3).
  */
object GeoFunctions {

  // NYC bounding box and ~100m grid (GeoUtils.java:29-47)
  val LonEast = -73.7
  val LonWest = -74.05
  val LatNorth = 41.0
  val LatSouth = 40.5
  val DeltaLon = 0.0014
  val DeltaLat = 0.00125
  val GridX = 250
  val GridY = 400
  val DegLen = 110.25

  /** F1: bounding-box containment (GeoUtils.java:57-60). */
  def isInNYC(lon: Column, lat: Column): Column =
    lon.between(LonWest, LonEast) && lat.between(LatSouth, LatNorth)

  private def xIndex(lon: Column): Column =
    floor((lit(math.abs(LonWest)) - abs(lon)) / lit(DeltaLon)).cast("int")
  private def yIndex(lat: Column): Column =
    floor((lit(LatNorth) - lat) / lit(DeltaLat)).cast("int")

  /** F2: lon/lat → grid-cell id, numbered NW→SE (GeoUtils.java:71-76). */
  def mapToGridCell(lon: Column, lat: Column): Column =
    xIndex(lon) + yIndex(lat) * lit(GridX)

  /** F4: inverse of F2 — cell center (GeoUtils.java:158-177). */
  def gridCellCenterLon(cellId: Column): Column =
    (lit(math.abs(LonWest)) - (cellId % lit(GridX)) * lit(DeltaLon)
      - lit(DeltaLon / 2)) * lit(-1.0)
  def gridCellCenterLat(cellId: Column): Column =
    lit(LatNorth) - ((cellId - cellId % lit(GridX)) / lit(GridX)) * lit(DeltaLat) -
      lit(DeltaLat / 2)

  /** F5: approximate km distance `110.25·√(Δlat² + (Δlon·cos lat₂)²)`
    * (GeoUtils.java:208-212; the cos argument is in *degrees* — a quirk of
    * the reference, preserved). */
  def euclideanDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val x = lat1 - lat2
    val y = (lon1 - lon2) * cos(lat2)
    lit(DegLen) * sqrt(x * x + y * y)
  }

  /** F6: bearing in degrees, 0°=E 90°=S, offset +179 (GeoUtils.java:227-234). */
  def directionAngle(startLon: Column, startLat: Column,
      destLon: Column, destLat: Column): Column = {
    val x = destLat - startLat
    val y = (destLon - startLon) * cos(startLat)
    (degrees(atan2(x, y))).cast("int") + lit(179)
  }

  /** F3: rasterize the segment between two grid positions to the list of
    * crossed cell ids (GeoUtils.java:89-150 — slope-walk algorithm).
    * Procedural loop → primitive-int walk ([[cellsOnWayInts]]) exposed as
    * a codegen Catalyst expression ([[GridCellsOnWay]]) — the survey's
    * custom-operator tier (b); the UDF face ([[mapToGridCellsOnWayUdf]])
    * is kept solely as the byte-equality witness in the test suite.
    *
    * Documented deviation: the reference's slope≤0 branch
    * (GeoUtils.java:137-143) drops the `else` before its second `if`, so
    * after a diagonal step the walk can move −2 cells/iteration, overshoot
    * `endY`, and never satisfy the loop condition — an infinite loop on
    * real inputs. We restore the `else` (mirroring the reference's own
    * slope>0 branch); the fixed walk provably terminates in
    * ≤ |Δx|+|Δy|+1 steps, so the guard below is a never-hit safety bound
    * rather than a silent 100k-cell truncation (the array doubles in the
    * impossible event the guard path is entered). */
  private[graft] def cellsOnWayInts(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double): Array[Int] = {
    def xi(lon: Double) = math.floor((math.abs(LonWest) - math.abs(lon)) / DeltaLon).toInt
    def yi(lat: Double) = math.floor((LatNorth - lat) / DeltaLat).toInt
    val (x1, y1, x2, y2) = (xi(lon1), yi(lat1), xi(lon2), yi(lat2))
    val (startX, startY, endX, endY) =
      if (x1 <= x2) (x1, y1, x2, y2) else (x2, y2, x1, y1)
    val slope = (endY - startY) / ((endX - startX) + 1e-8)
    var curX = startX
    var curY = startY
    // initial capacity: the walk's Manhattan bound, computed in Long (an
    // out-of-grid coordinate can put xi/yi near Int extremes, where the
    // Int sum overflows negative) and capped — the guard bounds the walk
    // to 100k steps, so a larger up-front allocation could only ever be
    // waste (or an OOM / NegativeArraySizeException on one corrupt row);
    // the doubling path below grows within the cap when needed
    val manhattan = (endX.toLong - startX.toLong) +
      math.abs(endY.toLong - startY.toLong) + 2L
    var cells = new Array[Int](math.min(manhattan, 4096L).toInt.max(2))
    cells(0) = curX + curY * GridX
    var m = 1
    var guard = 0
    while ((curX < endX || curY != endY) && guard < 100000) {
      guard += 1
      if (slope > 0) {
        val y = (curX - startX + 0.5) * slope + startY - 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY += 1 }
        else if (y < curY) curX += 1
        else curY += 1
      } else {
        val y = (curX - startX + 0.5) * slope + startY + 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY -= 1 }
        else if (y > curY) curX += 1
        else curY -= 1
      }
      if (m == cells.length) cells = java.util.Arrays.copyOf(cells, cells.length * 2)
      cells(m) = curX + curY * GridX
      m += 1
    }
    if (m == cells.length) cells else java.util.Arrays.copyOf(cells, m)
  }

  private[graft] def cellsOnWay(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double): Seq[Int] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      cellsOnWayInts(lon1, lat1, lon2, lat2))

  /** UDF face of the walk — retained only as the equality witness for
    * [[GridCellsOnWay]] (GeoFunctionsExprSpec asserts udf == expression
    * on the full q24 input shape). Production callers use
    * [[mapToGridCellsOnWay]]. */
  val mapToGridCellsOnWayUdf =
    udf((lon1: Double, lat1: Double, lon2: Double, lat2: Double) =>
      cellsOnWay(lon1, lat1, lon2, lat2))

  /** F3, production face: whole-stage-codegen expression — no per-row
    * boxing, no ArrayBuffer, no Scala-UDF serialization. */
  def mapToGridCellsOnWay(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column =
    GridCellsOnWay(lon1, lat1, lon2, lat2)
}
