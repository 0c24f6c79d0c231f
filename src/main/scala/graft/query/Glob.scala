package graft.query

/** Glob matching for wildcard term expansion (`te?t`, `t*st`, `*ing`).
  *
  * Lucene's WildcardQuery surface at the reference's search call-site
  * (/root/reference/src/searchindex.py:98): `*` matches any run (including
  * empty), `?` exactly one character. Semantics are pinned to DuckDB's
  * `GLOB` operator (the correctness oracle) — patterns here only ever
  * contain [a-z0-9*?] (the parser validates), so GLOB's bracket classes
  * never come into play.
  *
  * Iterative two-pointer with single-star backtracking: O(|s|·|p|) worst
  * case, linear in practice; no allocation.
  */
object Glob {

  def matches(s: String, p: String): Boolean = {
    var si = 0
    var pi = 0
    var starPi = -1
    var starSi = -1
    while (si < s.length) {
      if (pi < p.length && (p.charAt(pi) == '?' || p.charAt(pi) == s.charAt(si))) {
        si += 1; pi += 1
      } else if (pi < p.length && p.charAt(pi) == '*') {
        starPi = pi; pi += 1; starSi = si
      } else if (starPi >= 0) {
        // backtrack: let the last '*' absorb one more character
        pi = starPi + 1; starSi += 1; si = starSi
      } else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** The literal prefix of a pattern (chars before the first wildcard) —
    * the engine uses it as a term-range pushdown on the dictionary scan,
    * exactly like a trailing-`*` prefix query; a leading-wildcard pattern
    * has none and pays a full (vocabulary-bounded) scan, as in Solr.
    */
  def literalPrefix(p: String): String = {
    var i = 0
    while (i < p.length && p.charAt(i) != '*' && p.charAt(i) != '?') i += 1
    p.substring(0, i)
  }
}
