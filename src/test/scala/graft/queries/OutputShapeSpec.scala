package graft.queries

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.{SparkEntry, SparkSpec}

/** Pins the OUTPUT SHAPE contract for every oracle-gated query: the
  * driver's correctness gate canonicalizes results with pandas, which
  * sorts cell values — an `array`/`map`/`struct` top-level column is
  * unhashable there and turns a correct answer into a red row (this
  * exact failure shipped round 5's only red: `sim_quantize` returned
  * `array<tinyint>`). Any query whose natural result is nested must be
  * exploded to scalar rows (posexplode) or serialized to a string
  * before it leaves `SparkEntry.queries`.
  */
class OutputShapeSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("no SparkEntry.queries output has a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, d).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"driver-unsortable top-level columns: ${offenders.mkString(", ")}")
  }
}
