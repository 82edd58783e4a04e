package graft.queries

/** The measured deterministic/count-only split for the TPC-DS 99
  * value-fingerprint gate (see [[TpcdsFull]]).
  *
  * Membership = the queries whose measured Spark↔DuckDB fingerprint
  * diff traces to an ORDER BY tie at the LIMIT cutoff (both engines'
  * result sets are legal answers; the kept rows differ). The r9
  * measurement: ALL 99 hash-match on VALUES over TpcdsGen's data
  * (tools/TpcdsFpProbe vs the DuckDB side of the same fingerprint
  * SQL), so the set is EMPTY. Stable because the synthesized data
  * and the official query texts are both deterministic; if a future
  * TpcdsGen change introduces a cutoff tie, park that query number
  * here with a note instead of weakening the whole gate.
  */
object TpcdsFpSplit {
  val countOnly: Set[Int] = Set.empty
}
