package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import org.roaringbitmap.RoaringBitmap

/** Roaring-bitmap posting-list codecs.
  *
  * [[Bitmaps.cboSerialize]]/[[Bitmaps.cboDeserialize]] reproduce the
  * reference's "conditional byte order" codec
  * (`/root/reference/milli/src/heed_codec/roaring_bitmap/cbo_roaring_bitmap_codec.rs:11-54`):
  * ≤7 ids → raw u32 little-endian array, else standard roaring
  * serialization. The ≤7*4-byte length test disambiguates on read.
  *
  * Docids are u32 (Int here) exactly like the reference
  * (`milli/src/lib.rs:56`); at cluster scale the docid space is
  * range-partitioned so each posting shard stays within u32 — the shard id
  * lives in the table partitioning, not in the bitmap.
  */
object Bitmaps extends Serializable {

  final val CboThreshold = 7

  def cboSerialize(bm: RoaringBitmap): Array[Byte] = {
    val card = bm.getLongCardinality
    if (card <= CboThreshold) {
      val buf = ByteBuffer.allocate(card.toInt * 4).order(ByteOrder.LITTLE_ENDIAN)
      val it = bm.getIntIterator
      while (it.hasNext) buf.putInt(it.next())
      buf.array()
    } else {
      bm.runOptimize()
      // Disambiguation invariant: the raw-u32 form is ≤ 7*4 = 28 bytes, so
      // the roaring form must always be LONGER. The Rust roaring crate
      // guarantees that; Java run containers can serialize >7 consecutive
      // ids into < 28 bytes — strip run compression in that (tiny) case.
      if (bm.serializedSizeInBytes() <= CboThreshold * 4) bm.removeRunCompression()
      val buf = ByteBuffer.allocate(bm.serializedSizeInBytes())
      bm.serialize(buf)
      buf.array()
    }
  }

  def cboDeserialize(bytes: Array[Byte]): RoaringBitmap = {
    if (bytes.length <= CboThreshold * 4) {
      val bm = new RoaringBitmap()
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      while (buf.remaining() >= 4) bm.add(buf.getInt())
      bm
    } else {
      val bm = new RoaringBitmap()
      bm.deserialize(ByteBuffer.wrap(bytes))
      bm
    }
  }

  /** Cbo bytes straight from a SORTED-ASCENDING distinct id prefix
    * `ids[0, n)` — byte-identical to `cboSerialize(fromInts(...))` (the
    * raw-u32 form writes ids in ascending order, which is also roaring
    * iteration order) without allocating a bitmap for the ≤7-id case that
    * dominates map-side partial aggregation. */
  def cboSerializeInts(ids: Array[Int], n: Int): Array[Byte] = {
    var i = 1
    while (i < n && ids(i - 1) < ids(i)) i += 1
    if (i < n) { // defensive: a non-ascending caller still gets codec bytes
      val sorted = java.util.Arrays.copyOf(ids, n)
      java.util.Arrays.sort(sorted)
      var w = 1
      var r = 1
      while (r < n) {
        if (sorted(r) != sorted(w - 1)) { sorted(w) = sorted(r); w += 1 }
        r += 1
      }
      return cboSerializeInts(sorted, w)
    }
    if (n <= CboThreshold) {
      val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { buf.putInt(ids(i)); i += 1 }
      buf.array()
    } else {
      val bm = new RoaringBitmap()
      bm.addN(ids, 0, n)
      cboSerialize(bm)
    }
  }

  def fromInts(ids: Iterable[Int]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    ids.foreach(bm.add)
    bm
  }

  def toArray(bm: RoaringBitmap): Array[Int] = bm.toArray

  def and(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = RoaringBitmap.and(a, b)
  def or(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = RoaringBitmap.or(a, b)
  def andNot(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = RoaringBitmap.andNot(a, b)
}

/** Frame-of-reference compressed posting blocks with block-max skip
  * metadata, for the BM25 / block-max-WAND scale path (north rule).
  *
  * Layout per block (all varint, docids delta-encoded within the block):
  * `[count varint][firstDoc varint][docDelta varint, tf varint]*`.
  * Block metadata (maxDocid, maxTf, count) is stored alongside in columns
  * so WAND can skip blocks without decoding.
  */
object PostingBlocks extends Serializable {

  final val BlockSize = 128

  final case class Block(bytes: Array[Byte], maxDocid: Int, maxTf: Int, count: Int)

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v = v >>> 7 }
    out.write(v)
  }

  /** Encode sorted (docid, tf) postings into fixed-size FOR blocks. */
  def encode(postings: Array[(Int, Int)]): Array[Block] = {
    require(postings.isEmpty || postings.sliding(2).forall {
      case Array(a, b) => a._1 < b._1
      case _           => true
    }, "postings must be strictly sorted by docid")
    postings.grouped(BlockSize).map { group =>
      val out = new java.io.ByteArrayOutputStream(group.length * 3)
      writeVarint(out, group.length)
      writeVarint(out, group.head._1)
      var prev = group.head._1
      writeVarint(out, group.head._2)
      var maxTf = group.head._2
      var i = 1
      while (i < group.length) {
        val (d, tf) = group(i)
        writeVarint(out, d - prev)
        writeVarint(out, tf)
        prev = d
        if (tf > maxTf) maxTf = tf
        i += 1
      }
      Block(out.toByteArray, group.last._1, maxTf, group.length)
    }.toArray
  }

  /** Decode one block back to (docid, tf) pairs. */
  def decode(bytes: Array[Byte]): Array[(Int, Int)] = {
    var pos = 0
    def readVarint(): Int = {
      var v = 0; var shift = 0; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    val count = readVarint()
    val out = new Array[(Int, Int)](count)
    var doc = readVarint()
    out(0) = (doc, readVarint())
    var i = 1
    while (i < count) {
      doc += readVarint()
      out(i) = (doc, readVarint())
      i += 1
    }
    out
  }
}
