package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle-SQL strings against the double-stripMargin hazard.
  *
  * Shared CTE fragments are built with `.stripMargin` and then
  * interpolated into query templates that call `.stripMargin` again. If
  * any emitted line's first non-blank character is `|`, the second
  * stripMargin eats it — round 7 lost the bitwise OR in the simhash
  * fingerprint assembly exactly this way, and the oracle died with a
  * DuckDB parse error while `sbt test` stayed green. This spec makes
  * that class of corruption a build-time failure: every registered
  * oracle must be a fixed point of stripMargin.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  test("no oracle SQL line starts with a stripMargin-strippable '|'") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      sql.linesIterator.zipWithIndex.collect {
        case (line, i) if line.dropWhile(c => c == ' ' || c == '\t').startsWith("|") =>
          s"$name line ${i + 1}: $line"
      }
    }
    assert(
      offenders.isEmpty,
      s"oracle SQL would be corrupted by a second stripMargin:\n${offenders.mkString("\n")}",
    )
  }

  test("every oracle SQL is a fixed point of stripMargin") {
    val changed = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql) if sql.stripMargin != sql => name
    }
    assert(changed.isEmpty, s"stripMargin-unstable oracles: ${changed.mkString(", ")}")
  }
}
