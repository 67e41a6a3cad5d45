package graft.common

import java.util.regex.Pattern

/** Secret redaction for log lines (reference getl/logging.py:8-18
  * `SecretWordFilter`): values following `password`/`secret`/`connurl`
  * keys are replaced with `#redacted#` before a message is emitted.
  */
object Redact {

  val SecretWords: Seq[String] = Seq("password", "secret", "connurl")

  private val patterns: Seq[Pattern] = SecretWords.map { w =>
    // mirrors the reference regex ({word}':) (\S+)' with case-insensitive
    // + dotall flags, plus the YAML/Scala `word: value` shape
    Pattern.compile(s"(?is)($w['\"]?\\s*[:=])\\s*(\\S+)")
  }

  /** Redact secret values in a message. */
  def apply(msg: String): String =
    patterns.foldLeft(msg) { (m, p) =>
      p.matcher(m).replaceAll("$1 #redacted#")
    }

  /** Redacting log helper — all engine logging funnels through here. */
  def log(logger: org.slf4j.Logger, msg: String): Unit =
    logger.info(apply(msg))
}
