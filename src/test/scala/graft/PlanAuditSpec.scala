package graft

/** [[PlanAudit]] as a GATE (r11 verdict: the CLI sweep is advisory-only —
  * exit 0 always — so an unsanctioned global window could rot in its
  * stdout unnoticed). This spec runs the same detection over every
  * declared query's executed plan and FAILS on:
  *
  *  - any scale red flag (CartesianProduct, non-anchor BNLJ, unsanctioned
  *    empty-partition window) — the sweep's own rules, enforced;
  *  - a sanction-list mismatch in EITHER direction: a global window
  *    without a sanction (the rot case), or a sanction for a query that
  *    no longer windows globally (a stale allowance quietly widening what
  *    future plans may do).
  *
  * The de-sanction probe pins that the detector actually fires: stripping
  * the sanction map must flag every sanctioned query — so deliberately
  * removing one entry from [[PlanAudit.sanctionedGlobalWindows]] turns
  * this suite red, exactly the property the audit needs to be a gate.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Seq[(String, String)] =
    queries.Inventory.all.sortBy(_.name).map { q =>
      q.name -> q.fn(spark, sf0001).queryExecution.executedPlan.toString
    }

  test("no graded plan carries a scale red flag (the CLI sweep, as a gate)") {
    val flagged = plans.flatMap { case (name, plan) =>
      val f = PlanAudit.flags(name, plan)
      if (f.isEmpty) None else Some(s"$name: ${f.mkString("; ")}")
    }
    assert(flagged.isEmpty,
      s"\nunsanctioned plan flags:\n${flagged.mkString("\n")}")
  }

  test("the sanction list is exhaustive AND minimal: exactly the sanctioned queries window globally") {
    val global = plans.collect {
      case (name, plan) if PlanAudit.hasGlobalWindow(plan) => name
    }.toSet
    assert(global === PlanAudit.sanctionedGlobalWindows.keySet,
      s"\nglobal-window queries $global\n!= sanctioned ${PlanAudit.sanctionedGlobalWindows.keySet}")
  }

  test("de-sanction probe: without its sanction, every sanctioned query is flagged") {
    val byName = plans.toMap
    PlanAudit.sanctionedGlobalWindows.keySet.foreach { name =>
      val f = PlanAudit.flags(name, byName(name), sanctioned = Map.empty)
      assert(f.exists(_.contains("EMPTY partition spec")),
        s"$name is sanctioned but the detector would not flag it — stale sanction?")
    }
  }
}
