package graft.core.text

/** Character-trigram language identification (Cavnar–Trenkle out-of-place
  * rank distance) — the richer companion to the stopword-profile heuristic
  * in `graft.ops.DocTextOps.langIdStopword`. Pure, deterministic, and
  * self-contained: profiles are built at class-load time from small
  * hand-written seed corpora (no external data). Designed to be used as a
  * per-row kernel inside `mapPartitions` at any scale (no state, no I/O).
  *
  * Method: text → lowercase → runs of letters padded with '_' → trigram
  * frequency ranks; language score = Σ out-of-place rank deltas vs each
  * profile (missing trigram ⇒ max penalty); prediction = argmin with a
  * fixed tie-break on language code order.
  */
object TrigramLangId {

  val Langs: Vector[String] = Vector("de", "en", "es", "fr")

  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was " +
      "said that all of them would have been there with us for the time " +
      "being because this is what they wanted to know about when and where " +
      "which things were done and how people could not have more of their " +
      "own words in the other hand that must still make a good answer here"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund und " +
      "dann wurde gesagt dass alle von ihnen dort gewesen waeren mit uns " +
      "fuer die zeit weil dies ist was sie wissen wollten ueber wann und wo " +
      "welche dinge getan wurden und wie die leute nicht mehr von ihren " +
      "eigenen worten in der anderen hand haben koennten eine gute antwort"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso y luego " +
      "se dijo que todos ellos habrian estado alli con nosotros por el " +
      "tiempo porque esto es lo que querian saber sobre cuando y donde que " +
      "cosas se hicieron y como la gente no podria tener mas de sus propias " +
      "palabras en la otra mano que debe dar una buena respuesta aqui"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et " +
      "puis il a ete dit que tous entre eux auraient ete la avec nous pour " +
      "le temps parce que ceci est ce que ils voulaient savoir sur quand et " +
      "ou quelles choses ont ete faites et comment les gens ne pourraient " +
      "pas avoir plus de leurs propres mots dans la autre main une reponse"))

  val ProfileSize = 300

  /** Trigrams of `_`-padded letter runs, e.g. "the" → _th, the, he_. */
  def trigrams(text: String): Iterator[String] = {
    val words = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
    words.flatMap { w =>
      val padded = "_" + w + "_"
      (0 to padded.length - 3).iterator.map(i => padded.substring(i, i + 3))
    }
  }

  /** Ranked profile: trigram → rank (0 = most frequent). Ties broken by
    * trigram lexicographic order so the profile is a pure function of the
    * input text. */
  def profile(text: String, size: Int = ProfileSize): Map[String, Int] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    trigrams(text).foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
    counts.toVector
      .sortBy { case (t, c) => (-c, t) }
      .take(size)
      .iterator
      .zipWithIndex
      .map { case ((t, _), r) => t -> r }
      .toMap
  }

  private val langProfiles: Map[String, Map[String, Int]] =
    seeds.map { case (l, s) => l -> profile(s) }

  /** The per-language ranked profiles — public so the driver-facing DuckDB
    * oracle can be generated from the SAME constants (no drift possible). */
  def languageProfiles: Map[String, Map[String, Int]] = langProfiles

  /** Out-of-place distance of a document profile to a language profile. */
  def distance(docProfile: Map[String, Int], langProfile: Map[String, Int]): Long =
    docProfile.iterator.map { case (t, r) =>
      langProfile.get(t) match {
        case Some(lr) => math.abs(r - lr).toLong
        case None => ProfileSize.toLong
      }
    }.sum

  /** (predicted language, per-language distances in [[Langs]] order).
    * Documents with no letters at all predict "und". */
  def classify(text: String): (String, Vector[Long]) = {
    val dp = profile(text)
    if (dp.isEmpty) ("und", Langs.map(_ => Long.MaxValue))
    else {
      val ds = Langs.map(l => distance(dp, langProfiles(l)))
      val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      (Langs(best), ds)
    }
  }
}
