package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AdGuard-style domain blocklist matching — the filter-engine half of the
  * reference's product (its `blocked_domains` summary counts rows the DNS
  * filter already labeled; this operator IS the label step for the
  * dominant rule form, `||example.org^`: match the exact domain and every
  * subdomain of it).
  *
  * Spark-first shape: a per-row regex over K rules is O(rows·K) and
  * un-broadcastable at real blocklist sizes (AdGuard ships ~10⁵-10⁶
  * rules), so matching is made RELATIONAL — explode each domain into its
  * ≤ (maxLabels−minLabels+1) label-boundary suffixes and equi-join the
  * rule table on the suffix. Catalyst picks broadcast for small rule sets
  * and a shuffled hash join at blocklist scale; either way the work is
  * O(rows·levels) with no per-rule scan.
  *
  * Label-boundary semantics: suffix level k is `substring_index(d, ".",
  * -k)` guarded by the domain's label count, so `d0.click.net` matches
  * rule `d0.click.net` (level == labels ⇒ the full domain) and
  * `h9.d0.click.net` matches via its level-3 suffix, but a NON-boundary
  * lookalike (`xd0.click.net`) never joins — equality on whole suffixes
  * cannot match inside a label. Level 1 (bare TLD) is excluded by the
  * default `minLabels = 2`: TLD-wide rules are catch-alls the rule
  * grammar expresses differently.
  *
  * At 100 TB: the explode is a codegen'd Generate (bounded fan-out, no
  * shuffle); one equi-join on `_suffix` follows. A domain can match
  * several rules (exact + registrable) — each match is a row, which is
  * what per-rule hit accounting wants.
  */
object Blocklist {

  /** Rows of `df` joined to every rule whose suffix they match; output =
    * `df`'s columns + `ruleCol`. `maxLabels` bounds the explode (domains
    * with more labels are matched on their deepest `maxLabels` suffixes;
    * a rule deeper than `maxLabels` labels never matches — size it to
    * the rule set's deepest rule). */
  def suffixMatch(df: DataFrame, domainCol: String, rules: DataFrame,
      ruleCol: String, maxLabels: Int, minLabels: Int = 2): DataFrame = {
    require(minLabels >= 1 && maxLabels >= minLabels,
      s"need 1 <= minLabels <= maxLabels, got $minLabels..$maxLabels")
    val labels = size(split(col(domainCol), "\\."))
    val suffixes = (minLabels to maxLabels).map { k =>
      when(labels >= k, substring_index(col(domainCol), ".", -k))
    }
    df.withColumn("_suffix", explode(array(suffixes: _*)))
      .filter(col("_suffix").isNotNull)
      .join(rules, col("_suffix") === rules(ruleCol))
      .drop("_suffix")
  }
}
