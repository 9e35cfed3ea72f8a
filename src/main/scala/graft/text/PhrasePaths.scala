package graft.text

/** Translation of natural-language predicate templates ("X cause Y") into
  * DIRT path strings — reference `convertPhraseToPath`
  * (`DirtDriver.java:768-824`). The engine follows the *Java* grammar
  * end-to-end, not the simplified Python twin in `evaluate_dirt.py:11-38`
  * (which encodes passives with `>agent` instead of `>prep:P:by` — see
  * SURVEY.md §7.5.2).
  *
  * Grammar, applied to the inner words after stripping leading `X ` and
  * trailing ` Y`, with one optional leading auxiliary dropped:
  *   - `... V by`      -> `N:<nsubjpass:V:stem(V):>prep:P:by:>pobj:N`
  *   - `V`             -> `N:<nsubj:V:stem(V):>dobj:N`
  *   - `V PREP`        -> `N:<nsubj:V:stem(V):>prep:P:prep:>pobj:N`
  *   - `V PARTICLE PREP` -> collapse: `stem(V+particle)` + prep form
  *   - anything else   -> None (dropped, as the reference warns-and-skips).
  */
object PhrasePaths {

  private val Particles =
    Set("up", "down", "out", "in", "off", "on", "over", "through")

  def isParticle(w: String): Boolean = Particles.contains(w)

  def convert(phrase: String): Option[String] = {
    val inner = phrase
      .replaceAll("^X\\s+", "")
      .replaceAll("\\s+Y$", "")
      .trim
    if (inner.isEmpty) return None
    val w = inner.split("\\s+")

    // Optional leading auxiliary ("X is cured by Y" -> start at "cured").
    val start =
      if (w.length >= 2 && PathExtractor.Aux.contains(w(0).toLowerCase)) 1
      else 0
    val len = w.length - start
    if (len <= 0) return None

    // Passive: trailing "by" keys off absolute positions (reference `:785-789`).
    if (len >= 2 && w(w.length - 1).equalsIgnoreCase("by")) {
      val vStem = Porter.stem(w(w.length - 2))
      return Some(s"N:<nsubjpass:V:$vStem:>prep:P:by:>pobj:N")
    }

    len match {
      case 1 =>
        Some(s"N:<nsubj:V:${Porter.stem(w(start))}:>dobj:N")
      case 2 =>
        val prep = w(start + 1).toLowerCase
        Some(s"N:<nsubj:V:${Porter.stem(w(start))}:>prep:P:$prep:>pobj:N")
      case 3 if isParticle(w(start + 1).toLowerCase) =>
        // "break out into" -> composite stem of verb+particle (`:806-811`).
        val vStem = Porter.stem(w(start) + w(start + 1).toLowerCase)
        val prep = w(start + 2).toLowerCase
        Some(s"N:<nsubj:V:$vStem:>prep:P:$prep:>pobj:N")
      case _ => None
    }
  }
}
