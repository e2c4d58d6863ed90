package graft

/** SURVEY §2 is the judged coverage checklist; this spec pins it to the
  * code so the inventory and the registry can never drift: every
  * backticked key in a §2 table row must be a registered query, and
  * every registered query must appear in SURVEY §2.
  */
class InventorySpec extends SparkSpec {

  test("SURVEY §2 inventory and SparkEntry.queries are identical sets") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val section2 = survey.split("## §2 ")(1).split("## §3 ")(0)
    val keyRe = """\| `([a-z0-9_]+)` \|""".r
    val declared = keyRe.findAllMatchIn(section2).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missingFromCode = declared -- registered
    val missingFromSurvey = registered -- declared
    assert(missingFromCode.isEmpty,
      s"declared in SURVEY §2 but not registered: $missingFromCode")
    assert(missingFromSurvey.isEmpty,
      s"registered but not in SURVEY §2: $missingFromSurvey")
  }

  test("ScaleSmoke default ops are all registered queries") {
    val unknown = ScaleSmoke.defaultOps.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"defaultOps not in registry: $unknown")
  }

  test("every oracle key has a query and the flagship entry runs") {
    val q = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(q.contains(k), k))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
