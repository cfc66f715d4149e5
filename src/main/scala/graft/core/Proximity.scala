package graft.core

/** Proximity metric between word positions, identical to
  * `/root/reference/milli/src/proximity.rs:5-27`.
  */
object Proximity extends Serializable {
  final val MaxDistance = 8

  /** Directed proximity between two in-attribute word indices. */
  @inline def indexProximity(lhs: Int, rhs: Int): Int =
    if (lhs <= rhs) math.min(rhs - lhs, MaxDistance)
    else math.min((lhs - rhs) + 1, MaxDistance)

  /** Proximity between two absolute positions ((fieldId<<16)|pos);
    * different attributes are maximally distant. */
  def positionsProximity(lhs: Int, rhs: Int): Int = {
    val (lAttr, lIdx) = Tokenizer.relativeFromAbsolute(lhs)
    val (rAttr, rIdx) = Tokenizer.relativeFromAbsolute(rhs)
    if (lAttr != rAttr) MaxDistance
    else indexProximity(lIdx, rIdx)
  }

  /** Sum of successive-pair proximities along a path of absolute positions. */
  def pathProximity(path: Seq[Int]): Int =
    if (path.size < 2) 0
    else path.sliding(2).map { case Seq(a, b) => positionsProximity(a, b) }.sum
}
