package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: prefilter a huge fact table by a
  * compact bit-set of the dimension's join keys BEFORE the join shuffle.
  *
  * The gap this fills at 100 TB: when the dim side is too big for an exact
  * broadcast-hash join (say 500M surviving keys) the join goes sort-merge
  * and the ENTIRE fact table shuffles — including the ~99% of rows whose
  * keys have no dim match. A bloom filter of the dim keys is a few hundred
  * MB of bits regardless of key width, ships to every executor once, and
  * drops non-matching fact rows at scan speed (both expressions here are
  * Spark-internal codegen'd ops — the same machinery Spark's own
  * InjectRuntimeFilter uses, made explicit and deterministic). False
  * positives survive the prefilter but are removed by the exact join that
  * follows; false negatives are impossible, so the reduced join is
  * value-identical to the plain join — which is exactly what the DuckDB
  * oracle checks.
  *
  * The build side aggregates DISTRIBUTED (map-side partial blooms,
  * OR-merged); only the finished ~numBits/8-byte buffer hops through the
  * driver into a foldable literal — the same payload a broadcast variable
  * would ship. (`BloomFilterMightContain` requires a foldable or
  * scalar-subquery bloom side; on a real cluster the literal also rides the
  * once-per-stage task-binary broadcast, not per-task serialization.)
  */
object BloomJoin {

  /** The bloom build as a plain aggregate COLUMN — usable in a groupBy (one
    * filter per group, e.g. per file for a bloom manifest) as well as the
    * global build below. Hashes with XxHash64 seed 42, the same convention
    * Spark's InjectRuntimeFilter uses, so the serialized buffer probes
    * identically via [[mightContain]] (codegen) or [[mightContainLocal]]
    * (driver-side planning).
    */
  def bloomAggColumn(key: Column, expectedItems: Long, numBits: Long): Column = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedItems), Literal(numBits))
    Bridge.column(agg.toAggregateExpression())
  }

  /** Build a bloom filter over `key` with a distributed aggregate (partial
    * blooms OR-merge map-side). Returns the serialized filter, or null when
    * `dim` is empty.
    */
  def buildBloom(dim: DataFrame, key: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val row = dim.select(bloomAggColumn(key, expectedItems, numBits).as("bf")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Driver-side probe of a serialized bloom for a LONG key — planning-time
    * file pruning over a bloom manifest (O(files) work, no Spark job). Same
    * buffer format (`BloomFilter.readFrom`) and same XxHash64(seed=42)
    * the aggregate applied, so never false-negative vs the codegen probe.
    */
  def openBloom(bloom: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))

  def mightContainLocal(bf: org.apache.spark.util.sketch.BloomFilter,
      key: Long): Boolean =
    bf.mightContainLong(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        key, org.apache.spark.sql.types.LongType, 42L))

  /** Codegen'd membership probe; never false-negative. A null `bloom`
    * (empty build side) matches nothing — the join would be empty anyway.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))

  /** Equi-join with bloom prefilter on the fact side. Result is
    * value-identical to `fact.join(dim, factKey === dimKey)`: the bloom
    * passes all true matches and the exact join removes false positives.
    */
  def reducedJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact.filter(mightContain(bloom, factKey)).join(dim, factKey === dimKey)
  }
}
