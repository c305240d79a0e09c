package graft.operators

/** The shared SQL expression strings behind every shingle/simhash
  * operator AND its oracle-checked contract query. These strings ARE
  * the cross-engine parity contract (portable md5 nibbles, word
  * 3-grams): one definition here keeps [[Dedup]] and the
  * `graft.queries` contract faces from silently drifting apart. */
private[graft] object TextHashes {

  /** Non-empty whitespace tokens of a text column. */
  def toks(textRef: String): String =
    s"filter(split(trim($textRef), ' '), x -> x != '')"

  /** Word 3-gram shingle MULTISET over a token-array reference (the
    * single-level form safe to put directly inside an explode — see
    * PipelineQueries.q47 on InferFiltersFromGenerate). */
  def shingleTransform(toksRef: String): String =
    s"""transform(sequence(1, size($toksRef)-2),
       |  i -> concat(element_at($toksRef,i),' ',element_at($toksRef,i+1),' ',element_at($toksRef,i+2)))"""
      .stripMargin

  /** Distinct shingle SET as an array (narrow; never explode this
    * pre-built form). */
  def shingleSet(toksRef: String): String =
    s"array_distinct(${shingleTransform(toksRef)})"

  /** 16-bit token hash: first 4 md5 nibbles of the lambda variable
    * `tok` (portable across engines via instr on a hex alphabet). */
  val hv: String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(tok),$i,1)) - 1)"
    s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
  }

  /** Array of token hashes over distinct tokens of a text column. */
  def hvArray(textRef: String): String =
    s"transform(array_distinct(${toks(textRef)}), tok -> $hv)"

  /** SimHash signature over a token-hash-array reference: per-bit ±1
    * vote sums via `aggregate`, sign-thresholded into a 16-bit value. */
  def simhashSig(hvsRef: String): String = {
    def bitSum(b: Int) =
      s"aggregate($hvsRef, 0, (acc, h) -> acc + " +
        s"(case when (h div ${1 << b}) % 2 = 1 then 1 else -1 end))"
    (0 until 16)
      .map(b => s"(case when ${bitSum(b)} > 0 then ${1L << b}L else 0L end)")
      .mkString(" + ")
  }

  /** 32-bit nibble fold of an md5 HEX-STRING reference (q200's idiom,
    * factored round 15): BIGINT-typed, portable both engines. The
    * argument must already BE the md5 string — callers hash once and
    * fold nibbles over the result, because inlining `md5(x)` here
    * costs 8 digest evaluations per value wherever codegen's
    * subexpression elimination can't reach (inside a lambda it can't:
    * the first q203 cut measured 5.7 s at sf0.1, 3× the optimized
    * form). */
  def nib32(md5Ref: String): String =
    (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substr($md5Ref, $i, 1)) - 1)" +
        s" * ${1L << (4 * (8 - i))}L")
      .mkString("(", " + ", ")")

  /** 32-bit md5-nibble hash of an arbitrary string expression — ONE
    * digest + the [[nib32]] fold. Only safe where the engine can reuse
    * the digest (a plain projection); inside `transform` lambdas use
    * the two-step map in [[winnowKgramHashes]] instead. */
  def h32(strRef: String): String = nib32(s"md5($strRef)")

  /** Winnowing k-gram hash sequence over a token-array reference
    * (Schleimer et al. 2003): one 32-bit hash per k-token window, in
    * document order; empty below k tokens. Two-step transform — the
    * inner map computes each k-gram's md5 ONCE, the outer folds
    * nibbles — so the digest never re-evaluates per nibble. */
  def winnowKgramHashes(toksRef: String, k: Int = 3): String =
    s"""CASE WHEN size($toksRef) < $k THEN cast(array() as array<bigint>)
       |ELSE transform(
       |  transform(sequence(1, cast(size($toksRef) - ${k - 1} as bigint)),
       |    g -> md5(array_join(slice($toksRef, cast(g as int), $k), ' '))),
       |  m -> ${nib32("m")})
       |END""".stripMargin

  /** Winnowing fingerprint SET over a k-gram-hash-array reference:
    * each w-window's minimum hash, distinct. Shorter-than-w sequences
    * collapse to one window (the paper's boundary case); an empty hash
    * sequence yields an empty set. */
  def winnowSelect(hsRef: String, w: Int = 4): String =
    s"""array_distinct(CASE
       |WHEN size($hsRef) = 0 THEN cast(array() as array<bigint>)
       |ELSE transform(sequence(1, cast(greatest(size($hsRef) - ${w - 1}, 1) as bigint)),
       |  i -> array_min(slice($hsRef, cast(i as int), $w)))
       |END)""".stripMargin

  private def nibAt(mRef: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($mRef, $i, 1)) - 1)"

  /** HLL register index over an md5 HEX-STRING reference: the first
    * nibble — 16 registers. */
  def hllRegister(mRef: String): String = nibAt(mRef, 1)

  /** HLL ρ-statistic over an md5 HEX-STRING reference: the position of
    * the first 1-bit in the 32-bit value carried by nibbles 2–9
    * (1-based; 33 when all zero — Flajolet et al. 2007's rank). Pure
    * integer CASE logic: no log/float anywhere, so the value is
    * bit-identical on any engine (a floor(log2(v)) formulation trips
    * libm rounding at exact powers of two). The argument must already
    * BE the md5 string (hash once — nib32's rule). */
  def hllRho(mRef: String): String = {
    def lz(nib: String) =
      s"(CASE WHEN $nib >= 8 THEN 0 WHEN $nib >= 4 THEN 1 " +
        s"WHEN $nib >= 2 THEN 2 ELSE 3 END)"
    val branches = (2 to 9).map { i =>
      val n = nibAt(mRef, i)
      s"WHEN $n > 0 THEN ${4 * (i - 2)} + ${lz(n)} + 1"
    }.mkString(" ")
    s"(CASE $branches ELSE 33 END)"
  }
}
