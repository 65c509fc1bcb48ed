package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump [[graft.queries.MatchQueries.pairUniverseSql]] to a file
  * (default `fixtures/pair_universe.sql`) so the CPython score-fixture
  * generator (`fixtures/make_difflib_scores.py`) evaluates EXACTLY the SQL
  * the j2/j5 oracle derives its pair universe from — no hand-copied CTEs
  * that could drift from the Scala source of truth.
  *
  * Regeneration (only needed if the fixture tables or the name
  * constructions in [[graft.queries.Fixture]] change):
  * {{{
  *   sbt "runMain graft.tools.DumpPairUniverseSql"
  *   python3 fixtures/make_difflib_scores.py
  * }}}
  */
object DumpPairUniverseSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/pair_universe.sql")
    Files.writeString(Paths.get(out), graft.queries.MatchQueries.pairUniverseSql + "\n")
    println(s"wrote $out")
  }
}
