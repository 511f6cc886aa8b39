package graft.core

/** N-dimensional hyper-rectangle of chunk positions — semantic port of
  * `PosBox` (/root/reference/src/world/select.rs:11-119). Each dim holds an
  * inclusive `(start, end)` chunk-index range. Chunk indices are non-negative
  * Longs, so plain signed comparison is correct here.
  */
final case class PosBox(ranges: Vector[(Long, Long)]) {
  def dims: Int = ranges.length

  /** True iff every position in `o` is inside `this`
    * (/root/reference/src/world/select.rs:56-66). */
  def contains(o: PosBox): Boolean =
    ranges.zip(o.ranges).forall { case ((s, e), (os, oe)) => s <= os && oe <= e }

  def containsPos(pos: Vector[Long]): Boolean =
    ranges.zip(pos).forall { case ((s, e), p) => s <= p && p <= e }

  /** Per-dim intersection; empty → None
    * (/root/reference/src/world/select.rs:94-108). */
  def intersect(o: PosBox): Option[PosBox] = {
    val rs = ranges.zip(o.ranges).map { case ((s, e), (os, oe)) =>
      (math.max(s, os), math.min(e, oe))
    }
    if (rs.exists { case (s, e) => s > e }) None else Some(PosBox(rs))
  }

  /** Odometer iteration of all positions, dim-0 fastest
    * (/root/reference/src/world/select.rs:26-37). Test-scale only — the Spark
    * engine never enumerates positions; it emits a predicate instead.
    */
  def positions: Iterator[Vector[Long]] = {
    val sizes = ranges.map { case (s, e) => e - s + 1 }
    val total = sizes.product
    require(total >= 0 && total < Int.MaxValue, "position enumeration is test-scale only")
    Iterator.tabulate(total.toInt) { i =>
      var rem = i.toLong
      ranges.zip(sizes).map { case ((s, _), sz) =>
        val p = s + rem % sz; rem /= sz; p
      }
    }
  }
}

/** Selection shape: none / single box / union of boxes — semantic port of
  * `Shape` (/root/reference/src/world/select.rs:193-374). Union keeps boxes
  * deduped by containment; iteration dedups overlapping positions.
  */
sealed trait Shape {
  import Shape._

  /** Conjunctive compose (`Select::and`): intersect every box
    * (/root/reference/src/world/select.rs:274-291). */
  def intersect(box: PosBox): Shape = this match {
    case None_          => None_
    case Single(b)      => b.intersect(box).fold[Shape](None_)(Single)
    case Multiple(bs)   =>
      val out = bs.flatMap(_.intersect(box))
      fromBoxes(out)
  }

  /** Disjunctive compose (`Select::plus`): union with containment dedup —
    * boxes already covered are dropped; boxes covering existing ones replace
    * them (/root/reference/src/world/select.rs:121-134, 307-358). */
  def add(box: PosBox): Shape = this match {
    case None_        => Single(box)
    case Single(b)    =>
      if (b.contains(box)) Single(b)
      else if (box.contains(b)) Single(box)
      else Multiple(Vector(b, box))
    case Multiple(bs) =>
      if (bs.exists(_.contains(box))) Multiple(bs)
      else fromBoxes(bs.filterNot(box.contains) :+ box)
  }

  def boxes: Vector[PosBox] = this match {
    case None_        => Vector.empty
    case Single(b)    => Vector(b)
    case Multiple(bs) => bs
  }

  /** Deduped position walk: a position already emitted by an earlier box is
    * skipped (`done` list; /root/reference/src/world/select.rs:256-271).
    * Test-scale only. */
  def positions: Iterator[Vector[Long]] = {
    val bs = boxes
    bs.iterator.zipWithIndex.flatMap { case (b, i) =>
      b.positions.filterNot(p => bs.take(i).exists(_.containsPos(p)))
    }
  }
}

object Shape {
  case object None_ extends Shape
  final case class Single(box: PosBox) extends Shape
  final case class Multiple(bs: Vector[PosBox]) extends Shape

  def fromBoxes(bs: Vector[PosBox]): Shape = bs.length match {
    case 0 => None_
    case 1 => Single(bs.head)
    case _ => Multiple(bs)
  }
}
