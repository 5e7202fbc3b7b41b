package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-hygiene gates that protect oracle agreement from invisible
  * edits: a raw U+00A0/U+2003 inside a string literal (q163's Unicode
  * whitespace-collapse exercise) is indistinguishable from a space in
  * most editors, so any whitespace-normalizing pass would silently
  * desynchronize the Spark literal from the DuckDB oracle's
  * chr(160)||chr(8195). Such characters must appear as visible \\u
  * escapes only. */
class SourceHygieneSpec extends AnyFunSuite {

  private val invisibleWhitespace: Set[Int] =
    (0x2000 to 0x200B).toSet ++
      Set(0x0085, 0x00A0, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000, 0xFEFF)

  private def scalaSources(root: String): Seq[Path] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("no raw invisible non-ASCII whitespace bytes in any Scala source") {
    val offenders =
      (scalaSources("src/main/scala") ++ scalaSources("src/test/scala"))
        .flatMap { p =>
          val text =
            new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          text.linesIterator.zipWithIndex.collect {
            case (line, i) if line.exists(c =>
                invisibleWhitespace.contains(c.toInt)) =>
              val codes = line.filter(c =>
                invisibleWhitespace.contains(c.toInt))
                .map(c => f"U+${c.toInt}%04X").mkString(",")
              s"$p:${i + 1}: $codes"
          }
        }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
