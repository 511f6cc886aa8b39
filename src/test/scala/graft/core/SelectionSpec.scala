package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of `box_tests` (/root/reference/src/world/select.rs:136-191) and
  * `raw_shape_tests` (select.rs:376-394) — FIXTURES §A `boxes_2d` /
  * `shape_multi` — plus a seeded property check that shape iteration equals
  * the set-union of box enumerations.
  */
class SelectionSpec extends AnyFunSuite {
  private def box(rs: (Long, Long)*) = PosBox(rs.toVector)

  test("containment (select.rs:147-158)") {
    val big = box((0L, 10L), (1L, 11L))
    val small = box((2L, 5L), (1L, 11L))
    assert(big.contains(small))
    assert(!small.contains(big))
    assert(big.contains(big))
  }

  test("intersection incl. empty (select.rs:160-175)") {
    val a = box((2L, 5L), (10L, 24L))
    val b = box((0L, 10L), (1L, 11L))
    assert(a.intersect(b) == Some(box((2L, 5L), (10L, 11L))))
    val far = box((7L, 17L), (2L, 5L))
    assert(a.intersect(far) == None) // dim-1 ranges disjoint
  }

  test("odometer iteration order, dim-0 fastest (select.rs:26-37,177-190)") {
    val b = box((1L, 2L), (1L, 2L))
    assert(b.positions.toList == List(
      Vector(1L, 1L), Vector(2L, 1L), Vector(1L, 2L), Vector(2L, 2L)))
  }

  test("shape union dedups by containment (select.rs:121-134)") {
    val big = box((0L, 10L), (0L, 10L))
    val small = box((2L, 5L), (2L, 5L))
    // adding a contained box is a no-op
    assert(Shape.Single(big).add(small) == Shape.Single(big))
    // adding a covering box replaces
    assert(Shape.Single(small).add(big) == Shape.Single(big))
  }

  test("multi-box shape iterates exactly the union, deduped (select.rs:376-394)") {
    val s = Shape.Single(box((0L, 1L), (0L, 1L))).add(box((1L, 1L), (1L, 3L)))
    val got = s.positions.toList
    assert(got.distinct == got, "no duplicate positions")
    assert(got.toSet == Set(
      Vector(0L, 0L), Vector(0L, 1L), Vector(1L, 0L),
      Vector(1L, 1L), Vector(1L, 2L), Vector(1L, 3L)))
  }

  test("intersect shape with box narrows every member") {
    val s = Shape.Single(box((0L, 5L), (0L, 5L))).add(box((8L, 9L), (0L, 9L)))
    val cut = s.intersect(box((0L, 8L), (2L, 3L)))
    assert(cut.positions.toSet ==
      (for (x <- 0L to 5L; y <- 2L to 3L) yield Vector(x, y)).toSet ++
      Set(Vector(8L, 2L), Vector(8L, 3L)))
  }

  test("empty intersection -> None_") {
    val s = Shape.Single(box((0L, 1L), (0L, 1L)))
    assert(s.intersect(box((5L, 6L), (5L, 6L))) == Shape.None_)
    assert(Shape.None_.add(box((0L, 0L), (0L, 0L))) == Shape.Single(box((0L, 0L), (0L, 0L))))
  }

  test("property: shape positions == set union of box positions (seeded)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      def rbox() = PosBox(Vector.fill(2) {
        val s = rnd.nextInt(6).toLong; (s, s + rnd.nextInt(4))
      })
      val boxes = Vector.fill(1 + rnd.nextInt(4))(rbox())
      val shape = boxes.foldLeft[Shape](Shape.None_)(_.add(_))
      val got = shape.positions.toList
      val want = boxes.flatMap(_.positions).toSet
      assert(got.distinct == got, "deduped")
      assert(got.toSet == want, s"union semantics for $boxes")
    }
  }
}
