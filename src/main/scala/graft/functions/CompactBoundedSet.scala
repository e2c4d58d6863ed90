package graft.functions

import scala.collection.mutable

/** The aggregation buffer behind [[CollectSetBounded]]: a distinct-set
  * that stores `Long` elements UNBOXED in a growable primitive array and
  * everything else in a compact append-only buffer with linear-scan
  * membership, escalating to a hash index only past 128 elements.
  *
  * Why this exists: the natural buffer (`mutable.HashSet[Any]`) retains
  * ~50-90 bytes per element (boxed value + hash entry + table slack).
  * A posting-list aggregation holds one buffer per DISTINCT KEY in the
  * ObjectHashAggregate map, and the map side of a high-cardinality
  * aggregation materializes buffers for nearly every distinct key in
  * every task — 200k shingle keys × a cap-64 HashSet of boxed doc ids
  * ≈ 1.5 GB PER TASK, which is exactly the executor OOM the 300×
  * amplification smoke hit once the sort-fallback threshold allowed the
  * map to grow. The same set as primitive longs is ~600 bytes per full
  * buffer — an order of magnitude more keys per MB of heap, turning the
  * fallback threshold into a real memory bound instead of a hope.
  *
  * Contract (what [[CollectSetBounded]] relies on):
  * - `addOne` is distinct-insert: an element equal to a stored one is a
  *   no-op. Long elements compare unboxed; generic elements use catalyst
  *   value equality (copied values — `UnsafeRow` byte equality for
  *   structs), the same relation the old HashSet used.
  * - Iteration yields elements in insertion order (boxed for longs);
  *   callers must stay order-insensitive, as they had to with HashSet.
  * - Growable/Iterable, so Spark's `Collect.serialize`/`deserialize`
  *   (array round-trip through `+=`) work unchanged.
  *
  * Not thread-safe — aggregation buffers are task-confined.
  */
final class CompactBoundedSet extends mutable.Growable[Any]
    with Iterable[Any] {

  // Representation is decided by the FIRST inserted element: one
  // aggregation only ever sees one child type, so a mixed buffer can't
  // happen (longMode flips once, before any generic element exists).
  private var longMode = false
  private var longs: Array[Long] = null
  private var nLongs = 0
  // hash index over `longs` once linear scan stops being cheap:
  // open-addressed, power-of-2, EMPTY = Long.MinValue (tracked by a
  // flag so the sentinel value itself stays storable)
  private var longIdx: Array[Long] = null
  private var hasMinValue = false

  private var generic: mutable.ArrayBuffer[Any] = null
  private var genericIdx: mutable.HashSet[Any] = null

  private final val LinearMax = 128

  override def knownSize: Int = size
  override def size: Int = if (longMode) nLongs else if (generic == null) 0 else generic.size
  override def isEmpty: Boolean = size == 0

  def addOne(elem: Any): this.type = {
    elem match {
      case l: java.lang.Long if generic == null =>
        addLong(l.longValue())
      case _ =>
        if (longMode) demoteLongsToGeneric()
        if (generic == null) generic = new mutable.ArrayBuffer[Any](4)
        if (genericIdx != null) {
          if (genericIdx.add(elem)) generic += elem
        } else if (!generic.contains(elem)) {
          generic += elem
          if (generic.size > LinearMax) {
            genericIdx = mutable.HashSet.from(generic)
          }
        }
    }
    this
  }

  private def addLong(v: Long): Unit = {
    if (!longMode && nLongs == 0) longMode = true
    if (longIdx != null) {
      if (v == Long.MinValue) {
        if (hasMinValue) return
        hasMinValue = true
      } else if (!idxInsert(v)) return
      appendLong(v)
    } else {
      var i = 0
      while (i < nLongs) { if (longs(i) == v) return; i += 1 }
      appendLong(v)
      if (nLongs > LinearMax) buildLongIdx()
    }
  }

  private def appendLong(v: Long): Unit = {
    if (longs == null) longs = new Array[Long](4)
    else if (nLongs == longs.length)
      longs = java.util.Arrays.copyOf(longs, longs.length * 2)
    longs(nLongs) = v
    nLongs += 1
  }

  private def buildLongIdx(): Unit = {
    var cap = 8
    while (cap < nLongs * 4) cap <<= 1
    longIdx = Array.fill(cap)(Long.MinValue)
    hasMinValue = false
    var i = 0
    while (i < nLongs) {
      val v = longs(i)
      if (v == Long.MinValue) hasMinValue = true else idxInsert(v)
      i += 1
    }
  }

  /** Insert into the open-addressed index; false if already present.
    * Grows at 50% load. `Long.MinValue` never enters here.
    */
  private def idxInsert(v: Long): Boolean = {
    if ((nLongs + 1) * 2 > longIdx.length) {
      val old = longIdx
      longIdx = Array.fill(old.length * 2)(Long.MinValue)
      var i = 0
      while (i < old.length) {
        if (old(i) != Long.MinValue) idxPut(old(i))
        i += 1
      }
    }
    val mask = longIdx.length - 1
    var pos = scala.util.hashing.byteswap64(v).toInt & mask
    while (true) {
      val cur = longIdx(pos)
      if (cur == Long.MinValue) { longIdx(pos) = v; return true }
      if (cur == v) return false
      pos = (pos + 1) & mask
    }
    false
  }

  private def idxPut(v: Long): Unit = {
    val mask = longIdx.length - 1
    var pos = scala.util.hashing.byteswap64(v).toInt & mask
    while (longIdx(pos) != Long.MinValue) pos = (pos + 1) & mask
    longIdx(pos) = v
  }

  private def demoteLongsToGeneric(): Unit = {
    generic = new mutable.ArrayBuffer[Any](nLongs.max(4))
    var i = 0
    while (i < nLongs) { generic += Long.box(longs(i)); i += 1 }
    longMode = false; longs = null; nLongs = 0; longIdx = null
    if (generic.size > LinearMax) genericIdx = mutable.HashSet.from(generic)
  }

  override def iterator: Iterator[Any] =
    if (longMode) new Iterator[Any] {
      private var i = 0
      def hasNext: Boolean = i < nLongs
      def next(): Any = { val v = longs(i); i += 1; Long.box(v) }
    }
    else if (generic == null) Iterator.empty
    else generic.iterator

  override def clear(): Unit = {
    longMode = false; longs = null; nLongs = 0; longIdx = null
    hasMinValue = false; generic = null; genericIdx = null
  }
}
