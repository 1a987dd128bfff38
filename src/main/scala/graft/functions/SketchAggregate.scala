package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

import TextFunctions.HashMod

/** KMV (k-minimum-values) distinct-count sketch as a typed imperative
  * aggregate: each group keeps the k smallest DISTINCT hash values seen;
  * the k-th smallest estimates the distinct count as (k-1)·P / kth
  * (hashes uniform on [0, P) ⇒ the k-th order statistic of n distinct
  * uniforms ≈ k·P/n). Groups with fewer than k distinct hashes report
  * the exact count.
  *
  * Why this sketch (vs HyperLogLog): the state is a plain bounded set of
  * hash values — mergeable by union+trim (partial aggregation works
  * map-side, shuffle carries ≤ k longs per group per partition), and
  * every operation is DETERMINISTIC integer arithmetic on the engine's
  * polynomial hashes, so DuckDB re-derives the sketch — including the
  * estimate, a single exact-operand double division — bit-for-bit.
  * approx_count_distinct's HLL± is engine-internal and cannot be
  * oracle-checked; this one is. Error is ~1/√(k-2) relative (~9% at
  * k=128), the standard KMV bound.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("kth_hash", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) SketchAggregate.push(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) SketchAggregate.push(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val kth = if (buf.size < k) -1L else buf.last().longValue()
    InternalRow(kth, SketchAggregate.estimate(buf, k))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0))
}

/** The raw KMV SAMPLE — the sorted (ascending) set of ≤ k smallest
  * distinct hashes, i.e. the sketch's mergeable state itself — for
  * sketch SET ALGEBRA: the union of two sets sketches as the bottom-k
  * of the two samples' union, and the intersection estimate rides the
  * merged sample's membership in both sides (the standard KMV
  * union/intersection estimators). Same buffer, same [[SketchAggregate.push]]
  * keep-k, same determinism contract as [[KmvSketchAgg]]. */
case class KmvSampleAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "kmv_sample needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sample"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) SketchAggregate.push(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) SketchAggregate.push(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 } // TreeSet iterates ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSampleAgg =
    copy(child = newChildren(0))
}

object SketchAggregate {
  /** Column: KMV distinct sketch of a long hash column. */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnShim.column(KmvSketchAgg(ColumnShim.expression(hash), k)
      .toAggregateExpression())

  /** Column: the sorted bottom-k KMV sample of a long hash column. */
  def kmvSample(hash: Column, k: Int): Column =
    ColumnShim.column(KmvSampleAgg(ColumnShim.expression(hash), k)
      .toAggregateExpression())

  // The sketch primitives, shared by the batch aggregate above and the
  // streaming RunningKmvProcessor — ONE definition of the keep-k and
  // estimate arithmetic, so batch/stream parity is structural, not a
  // convention two copies must honor.

  /** Insert v into the bounded set of the k smallest distinct values. */
  def push(buf: java.util.TreeSet[java.lang.Long], v: Long, k: Int): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }

  /** Distinct estimate: exact below k; (k-1)·P / kth-smallest at k.
    * (k-1)·P stays under 2^53 — the product and the single division are
    * exact-operand IEEE ops, reproducible bit-for-bit. */
  def estimate(buf: java.util.TreeSet[java.lang.Long], k: Int): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * HashMod.toDouble / buf.last().longValue().toDouble
}
