package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting, shingling.
  * All native column expressions (codegen'd, no UDFs).
  */
object text {

  /** Whitespace-delimited token count. */
  def wsTokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit("\\S+"), lit(0)))

  /** BPE-ish sub-token stream: runs of letters, runs of digits, single
    * non-alphanumeric marks (rough proxy for byte-pair token counts).
    */
  def bpeTokens(t: Column): Column =
    regexp_extract_all(lower(t), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(t: Column): Column = size(bpeTokens(t))

  /** Lower-cased alphabetic words. */
  def words(t: Column): Column =
    regexp_extract_all(lower(t), lit("[a-z]+"), lit(0))

  /** Gopher-style rule metrics (Rae et al. 2021, appendix A1 subset) for
    * corpus filtering, as one struct of native column expressions:
    * word count, mean word length, symbol-to-word ratio ('#' and '...'),
    * bullet-/ellipsis-line fractions, alphabetic-word fraction and
    * duplicate-line fraction, plus the combined `keep` verdict. Ratios
    * round to 5 decimals so the SQL oracle reproduces them bit-exactly.
    * The word-count floor is 20 (the reference's 50 would reject most of
    * a short-document corpus wholesale; the floor is the tunable here).
    */
  def gopherMetrics(t: Column): Column = {
    val toks = regexp_extract_all(t, lit("\\S+"), lit(0))
    val nWords = greatest(size(toks), lit(1))
    val meanLen = round(
      aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double")
        / nWords, 5)
    val symbols = length(regexp_replace(t, "[^#]", "")) +
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
    val symbolRatio = round(symbols.cast("double") / nWords, 5)
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = greatest(size(lines), lit(1))
    val bulletFrac = round(size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("double") / nLines, 5)
    val ellipsisFrac = round(size(filter(lines,
      l => trim(l).endsWith("..."))).cast("double") / nLines, 5)
    val alphaFrac = round(size(filter(toks,
      w => w.rlike("[A-Za-z]"))).cast("double") / nWords, 5)
    val dupLineFrac = round(lit(1.0) -
      size(array_distinct(lines)).cast("double") / nLines, 5)
    struct(
      size(toks).cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_word_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      dupLineFrac.as("dup_line_frac"),
      (size(toks) >= 20 && size(toks) <= 100000 &&
        meanLen >= 3 && meanLen <= 10 &&
        symbolRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
        alphaFrac > 0.8 && dupLineFrac < 0.3).as("keep"))
  }

  /** Whitespace tokens joined into sorted word n-grams — the shared prep
    * of [[topNgramCharFrac]]/[[dupNgramCharFrac]]. Docs with fewer than
    * `n` tokens produce an empty list.
    */
  private def ngramsSorted(t: Column, n: Int): Column = {
    val toks = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    array_sort(when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>")))
  }

  /** Gopher repetition metric (Rae et al. 2021 A1): fraction of the
    * document's characters covered by occurrences of its single most
    * frequent word n-gram (ties -> lexicographically smallest). Computed
    * as a per-row fold over the SORTED gram list (longest equal-run =
    * most frequent gram) — pure expression work, NO shuffle, unlike a
    * gram-explode + groupBy which would ship every gram of a 100 TB
    * corpus through an exchange to answer a per-document question. The
    * DuckDB oracle replays the identical sorted fold. Rounds to 5 dp.
    */
  def topNgramCharFrac(t: Column, n: Int): Column = {
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("bc"), lit("").as("bg"))
    val folded = aggregate(ngramsSorted(t, n), init, (a, x) => {
      val newRun = when(x === a.getField("prev"), a.getField("run") + 1)
        .otherwise(lit(1L))
      val better = newRun > a.getField("bc")
      struct(x.as("prev"), newRun.as("run"),
        when(better, newRun).otherwise(a.getField("bc")).as("bc"),
        when(better, x).otherwise(a.getField("bg")).as("bg"))
    })
    round(folded.getField("bc") * length(folded.getField("bg"))
      / greatest(length(t), lit(1)).cast("double"), 5)
  }

  /** Gopher repetition metric (Rae et al. 2021 A1): fraction of the
    * document's characters covered by word n-grams that occur more than
    * once — each occurrence of a duplicated gram contributes its length
    * (overlaps between adjacent grams are NOT discounted, the paper's
    * own approximation), clamped to 1. Same zero-shuffle sorted-fold
    * shape as [[topNgramCharFrac]].
    */
  def dupNgramCharFrac(t: Column, n: Int): Column = {
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("dup"))
    val folded = aggregate(ngramsSorted(t, n), init, (a, x) => {
      val newRun = when(x === a.getField("prev"), a.getField("run") + 1)
        .otherwise(lit(1L))
      // run reaching 2 retro-charges the first occurrence too
      val add = when(newRun === 2, length(x).cast("long") * 2)
        .when(newRun > 2, length(x).cast("long"))
        .otherwise(lit(0L))
      struct(x.as("prev"), newRun.as("run"),
        (a.getField("dup") + add).as("dup"))
    })
    round(least(folded.getField("dup")
      / greatest(length(t), lit(1)).cast("double"), lit(1.0)), 5)
  }

  def alphaCount(t: Column): Column =
    length(regexp_replace(t, "[^A-Za-z]", ""))

  def punctCount(t: Column): Column =
    length(regexp_replace(t, "[^.,;:!?]", ""))

  val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "was", "for", "on", "with", "as", "at", "by", "be",
    "this")

  def stopwordCount(t: Column, stopwords: Seq[String] = stopwordsEn): Column =
    size(filter(words(t), w => w.isin(stopwords.map(x => x: Any): _*)))

  /** Composite quality score in [0,1]: weighted mix of alpha ratio, a
    * length-normalized token count, stopword presence and low punctuation.
    */
  def qualityScore(t: Column): Column = {
    val n = greatest(length(t), lit(1))
    val tok = greatest(wsTokenCount(t), lit(1))
    val alphaRatio = alphaCount(t).cast("double") / n
    val punctRatio = punctCount(t).cast("double") / n
    val stopRatio = stopwordCount(t).cast("double") / tok
    // +1e-9 before the 5-dp round: the weighted sum can land exactly on
    // a decimal tie (e.g. 0.653125), where Spark rounds the shortest
    // decimal repr UP while DuckDB rounds the binary double DOWN — a
    // 1-ulp hash break. The nudge shifts ties identically on both sides
    // (the oracle adds the same literal) and is invisible elsewhere.
    round(least(lit(1.0),
      alphaRatio * 0.5 + least(stopRatio * 2.0, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2) +
      lit(1e-9), 5)
  }

  /** Stopword lists used by the n-gram/stopword language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit",
      "sich", "auf"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "una", "por", "para",
      "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que",
      "pas")
  )

  private def langScore(t: Column, sw: Seq[String]): Column =
    size(filter(words(t), w => w.isin(sw.map(x => x: Any): _*)))

  /** Heuristic language ID: argmax of per-language stopword hits, ties
    * broken by list order (en > de > es > fr), "und" when all scores are 0.
    */
  def langId(t: Column): Column = {
    val scores = langStopwords.map { case (l, sw) => l -> langScore(t, sw) }
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    // argmax with deterministic tie-break = first list entry with max score
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.reverse.foldLeft(lit("und")) { case (els, (l, s)) =>
      when(s === maxScore, lit(l)).otherwise(els)
    }
    when(allZero, "und").otherwise(pick)
  }

  /** Document fingerprint: content hash of the whitespace-normalized,
    * lower-cased text.
    */
  def fingerprint(t: Column): Column =
    md5(trim(regexp_replace(lower(t), "\\s+", " ")))

  /** Word n-gram shingles (empty array when fewer than n words). */
  def wordShingles(t: Column, n: Int): Column = {
    val ws = words(t)
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-grams of the normalized text. */
  def charNgrams(t: Column, n: Int): Column = {
    val s = trim(regexp_replace(lower(t), "\\s+", " "))
    when(length(s) >= n,
      array_distinct(transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-language seed texts for the n-gram language-ID profiles: UDHR
    * Articles 1–2 (public-domain translations), punctuation pre-stripped
    * so the same literal interpolates into SQL unescaped. Profiles are
    * DERIVED from these on both engines — the Scala side below, the
    * DuckDB oracle with its own relational walk over the identical
    * literals — so a derivation bug on either side breaks the gate.
    */
  val langSeeds: Seq[(String, String)] = Seq(
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen Jeder hat Anspruch " +
      "auf die in dieser Erklärung verkündeten Rechte und Freiheiten " +
      "ohne irgendeinen Unterschied etwa nach Rasse Hautfarbe Geschlecht " +
      "Sprache Religion politischer oder sonstiger Überzeugung nationaler " +
      "oder sozialer Herkunft Vermögen Geburt oder sonstigem Stand " +
      "Jeder hat das Recht auf Leben Freiheit und Sicherheit der Person " +
      "Niemand darf in Sklaverei oder Leibeigenschaft gehalten werden " +
      "Sklaverei und Sklavenhandel sind in allen ihren Formen verboten " +
      "Niemand darf der Folter oder grausamer unmenschlicher oder " +
      "erniedrigender Behandlung oder Strafe unterworfen werden Jeder " +
      "hat das Recht überall als rechtsfähig anerkannt zu werden Alle " +
      "Menschen sind vor dem Gesetz gleich und haben ohne Unterschied " +
      "Anspruch auf gleichen Schutz durch das Gesetz"),
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood Everyone is " +
      "entitled to all the rights and freedoms set forth in this " +
      "declaration without distinction of any kind such as race colour " +
      "sex language religion political or other opinion national or " +
      "social origin property birth or other status " +
      "Everyone has the right to life liberty and security of person " +
      "No one shall be held in slavery or servitude slavery and the " +
      "slave trade shall be prohibited in all their forms No one shall " +
      "be subjected to torture or to cruel inhuman or degrading " +
      "treatment or punishment Everyone has the right to recognition " +
      "everywhere as a person before the law All are equal before the " +
      "law and are entitled without any discrimination to equal " +
      "protection of the law"),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad " +
      "y derechos y dotados como están de razón y conciencia deben " +
      "comportarse fraternalmente los unos con los otros Toda persona " +
      "tiene todos los derechos y libertades proclamados en esta " +
      "declaración sin distinción alguna de raza color sexo idioma " +
      "religión opinión política o de cualquier otra índole origen " +
      "nacional o social posición económica nacimiento o cualquier otra " +
      "condición Todo individuo tiene derecho a la vida a la libertad " +
      "y a la seguridad de su persona Nadie estará sometido a " +
      "esclavitud ni a servidumbre la esclavitud y la trata de esclavos " +
      "están prohibidas en todas sus formas Nadie será sometido a " +
      "torturas ni a penas o tratos crueles inhumanos o degradantes " +
      "Todo ser humano tiene derecho en todas partes al reconocimiento " +
      "de su personalidad jurídica Todos son iguales ante la ley y " +
      "tienen sin distinción derecho a igual protección de la ley"),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité " +
      "et en droits Ils sont doués de raison et de conscience et doivent " +
      "agir les uns envers les autres dans un esprit de fraternité " +
      "Chacun peut se prévaloir de tous les droits et de toutes les " +
      "libertés proclamés dans la présente déclaration sans distinction " +
      "aucune notamment de race de couleur de sexe de langue de religion " +
      "d opinion politique ou de toute autre opinion d origine nationale " +
      "ou sociale de fortune de naissance ou de toute autre situation " +
      "Tout individu a droit à la vie à la liberté et à la sûreté de sa " +
      "personne Nul ne sera tenu en esclavage ni en servitude l " +
      "esclavage et la traite des esclaves sont interdits sous toutes " +
      "leurs formes Nul ne sera soumis à la torture ni à des peines ou " +
      "traitements cruels inhumains ou dégradants Chacun a le droit à " +
      "la reconnaissance en tous lieux de sa personnalité juridique " +
      "Tous sont égaux devant la loi et ont droit sans distinction à " +
      "une égale protection de la loi"),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità " +
      "e diritti Essi sono dotati di ragione e di coscienza e devono " +
      "agire gli uni verso gli altri in spirito di fratellanza Ad ogni " +
      "individuo spettano tutti i diritti e tutte le libertà enunciate " +
      "nella presente dichiarazione senza distinzione alcuna per ragioni " +
      "di razza di colore di sesso di lingua di religione di opinione " +
      "politica o di altro genere di origine nazionale o sociale di " +
      "ricchezza di nascita o di altra condizione Ogni individuo ha " +
      "diritto alla vita alla libertà e alla sicurezza della propria " +
      "persona Nessun individuo potrà essere tenuto in stato di " +
      "schiavitù o di servitù la schiavitù e la tratta degli schiavi " +
      "saranno proibite sotto qualsiasi forma Nessun individuo potrà " +
      "essere sottoposto a tortura o a trattamento o a punizione " +
      "crudeli inumani o degradanti Ogni individuo ha diritto in ogni " +
      "luogo al riconoscimento della sua personalità giuridica Tutti " +
      "sono eguali dinanzi alla legge e hanno diritto senza alcuna " +
      "discriminazione ad una eguale tutela da parte della legge"),
    "nl" -> ("Alle mensen worden vrij en gelijk in waardigheid en rechten " +
      "geboren Zij zijn begiftigd met verstand en geweten en behoren " +
      "zich jegens elkander in een geest van broederschap te gedragen " +
      "Een ieder heeft aanspraak op alle rechten en vrijheden in deze " +
      "verklaring opgesomd zonder enig onderscheid van welke aard ook " +
      "zoals ras kleur geslacht taal godsdienst politieke of andere " +
      "overtuiging nationale of maatschappelijke afkomst eigendom " +
      "geboorte of andere status Een ieder heeft het recht op leven " +
      "vrijheid en onschendbaarheid van zijn persoon Niemand zal in " +
      "slavernij of horigheid gehouden worden slavernij en slavenhandel " +
      "in iedere vorm zijn verboden Niemand zal onderworpen worden aan " +
      "folteringen noch aan een wrede onmenselijke of onterende " +
      "behandeling of bestraffing Een ieder heeft waar hij zich ook " +
      "bevindt het recht als persoon erkend te worden voor de wet Allen " +
      "zijn gelijk voor de wet en hebben zonder onderscheid aanspraak " +
      "op gelijke bescherming door de wet"),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em dignidade " +
      "e em direitos Dotados de razão e de consciência devem agir uns " +
      "para com os outros em espírito de fraternidade Todos os seres " +
      "humanos podem invocar os direitos e as liberdades proclamados na " +
      "presente declaração sem distinção alguma nomeadamente de raça de " +
      "cor de sexo de língua de religião de opinião política ou outra " +
      "de origem nacional ou social de fortuna de nascimento ou de " +
      "qualquer outra situação Todo indivíduo tem direito à vida à " +
      "liberdade e à segurança pessoal Ninguém será mantido em " +
      "escravidão ou servidão a escravidão e o tráfico de escravos " +
      "serão proibidos em todas as suas formas Ninguém será submetido " +
      "a tortura nem a penas ou tratamentos cruéis desumanos ou " +
      "degradantes Todos os indivíduos têm direito ao reconhecimento " +
      "em todos os lugares da sua personalidade jurídica Todos são " +
      "iguais perante a lei e sem distinção têm direito a igual " +
      "proteção da lei"))

  /** Rank cutoff K of the Cavnar–Trenkle profiles: grams ranked past K
    * are dropped. The seeds produce ~530–600 distinct grams per
    * language; K = 400 keeps the discriminative mid-tail (measured on
    * the labeled fixture: 0.87 at K = 200 → 0.94 at K = 400, flat to
    * K = 600, dropping when the tail noise enters uncapped).
    */
  val langIdTopK = 400

  /** Shared gram definition of [[langDocProfile]]: lower-case, collapse
    * non-letter runs to one space, then every char 2- and 3-gram of each
    * space-padded word — boundary grams (" th", "er ") carry the
    * word-initial/final signal that makes char profiles beat stopword
    * hits on short text (Cavnar & Trenkle 1994).
    */
  private def paddedWordGrams(t: Column): Column = {
    val norm = trim(regexp_replace(lower(t), "[^\\p{L}]+", " "))
    val ws = when(length(norm) > 0, split(norm, " "))
      .otherwise(array().cast("array<string>"))
    flatten(transform(ws, w => {
      val p = concat(lit(" "), w, lit(" "))
      concat(
        transform(sequence(lit(1), length(p) - 1), i => p.substr(i, lit(2))),
        transform(sequence(lit(1), length(p) - 2), i => p.substr(i, lit(3))))
    }))
  }

  /** Per-language char-n-gram rank profiles, derived from [[langSeeds]]
    * with the exact algorithm [[langDocProfile]] applies to documents:
    * count padded-word 2/3-grams, rank by (count desc, gram asc — byte
    * order, same as both engines' string compare on BMP text), keep the
    * top [[langIdTopK]]. Driver-side Scala over ~100-word seeds; the
    * result ships into the plan as literal maps, so scoring needs no
    * join at all — cheaper than broadcasting a profile table, and the
    * DuckDB oracle re-derives the same profiles relationally.
    */
  lazy val langNgramProfiles: Seq[(String, Seq[(String, Int)])] =
    langSeeds.map { case (lang, seed) =>
      val norm = seed.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^\\p{L}]+", " ").trim
      val grams = norm.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        val p = " " + w + " "
        Seq(2, 3).flatMap(n => p.sliding(n).filter(_.length == n))
      }
      val prof = grams.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(langIdTopK)
        .zipWithIndex.map { case ((g, _), i) => (g, i + 1) }
      lang -> prof
    }

  /** Stage 1 of the language-ID pipeline: the document's padded
    * 2/3-gram list. Alias this into its own projection;
    * [[langNgramScores]] must receive it as a bound attribute.
    */
  def langGrams(t: Column): Column = paddedWordGrams(t)

  /** Per-language n-gram scores from a [[langGrams]] COLUMN: each doc
    * gram OCCURRENCE earns the language's inverted profile rank
    * (K + 1 − rank, so the seed's top gram pays [[langIdTopK]] and the
    * K-th pays 1; grams outside the profile pay 0). The inverted-rank
    * sum keeps Cavnar & Trenkle's rank framework but stays informative
    * on SHORT documents, where the classic out-of-place distance
    * degenerates: a short doc's own profile has every count = 1, so its
    * ranks collapse to alphabetical order and the distance is noise —
    * measured on the labeled fixture, rank-distance scored 0.79 against
    * this form's 0.94 (an IDF reweighting scored 0.83 — the shared
    * function-word grams it suppresses ARE the signal). Profiles ride
    * as constant-folded literal maps — no join, no broadcast, zero
    * exchanges; entirely integer.
    *
    * IMPORTANT for callers: pass bound attributes and stage the fan-out
    * (grams column -> 7 score columns -> pick). The transform lambda
    * below may reference only its element and the literal map: Catalyst
    * re-evaluates a closed-over NON-attribute expression once PER ARRAY
    * ELEMENT, and a single-Column formulation duplicates the gram
    * subtree into every score (~70 structural copies after the argmax
    * fold) — both grind the optimizer/runtime for minutes.
    */
  def langNgramScores(gramsCol: Column): Seq[(String, Column)] =
    langNgramProfiles.map { case (lang, prof) =>
      val m = map(prof.flatMap { case (g, r) =>
        Seq(lit(g), lit(langIdTopK + 1 - r)) }: _*)
      lang -> aggregate(
        transform(gramsCol, g =>
          coalesce(try_element_at(m, g).cast("long"), lit(0L))),
        lit(0L), (a, x) => a + x)
    }

  /** Argmax language over [[langNgramScores]] COLUMNS (again: bound
    * attributes): ties break to the alphabetically-first language; `und`
    * when the doc has no grams or NO gram hit any profile (max score
    * 0) — routing non-Latin scripts and gibberish to `und` instead of a
    * coin-flip.
    */
  def langNgramPick(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.sortBy(_._1).reverse.foldLeft(lit("und")) {
      case (els, (l, d)) => when(d === maxScore, lit(l)).otherwise(els)
    }
    when(maxScore === 0, lit("und")).otherwise(pick)
  }

  // PII patterns, written to the regex subset Java and RE2 share (no
  // backrefs, no lookaround) so an RE2-based oracle matches identically
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?"
  private[graft] val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII scrub for training corpora: replace emails, international-format
    * phone numbers and IPv4 addresses with typed placeholder tags, plus
    * per-category match counts (struct: redacted, n_emails, n_phones,
    * n_ips). Order matters: emails first so `user@1.2.3.4`-style strings
    * are consumed as one email, not an IP — the same cascade any
    * multi-pattern scrubber needs. Pure regexp_replace/regexp_count
    * columns => codegen'd, scales linearly, no UDF.
    */
  def redactPii(t: Column): Column = {
    val r1 = regexp_replace(t, emailRe, "<EMAIL>")
    val r2 = regexp_replace(r1, phoneRe, "<PHONE>")
    val r3 = regexp_replace(r2, ipv4Re, "<IP>")
    struct(
      r3.as("redacted"),
      regexp_count(t, lit(emailRe)).as("n_emails"),
      regexp_count(r1, lit(phoneRe)).as("n_phones"),
      regexp_count(r2, lit(ipv4Re)).as("n_ips"))
  }

  /** A vocabulary as a token→1 lookup map column, for
    * [[vocabTokenStats]]. Literal form for in-code vocabularies; a
    * vocabulary table loaded from parquet instead collapses to one
    * map row via `map_from_entries(collect_list(...))` and rides a
    * broadcast cross join (the Classifier/e15 pattern) — same column,
    * same downstream plan.
    */
  def vocabMap(vocab: Seq[String]): Column = {
    require(vocab.nonEmpty && vocab.distinct.size == vocab.size,
      "vocab must be non-empty and duplicate-free")
    map(vocab.flatMap(v => Seq(lit(v), lit(1))): _*)
  }

  /** Real-vocabulary token accounting: greedy longest-match tokenization
    * (the WordPiece/BPE serving rule) of the lower-cased text against a
    * vocabulary map, as ONE per-row left-to-right fold — struct of
    * `vocab_tokens` (tokens emitted) and `fallback_tokens` (positions no
    * vocab entry covered, emitted as single characters: the coverage
    * signal). This is what token-budget stages (t7 pack / t13 chunk)
    * should count with when a real tokenizer vocab is available —
    * [[bpeTokenCount]] is a regex proxy whose counts drift from any
    * actual vocab.
    *
    * At each position the longest vocab entry (≤ `maxLen` chars)
    * starting there is consumed; covered positions are skipped by the
    * fold's `next` cursor. Zero shuffles, zero joins — the map is a
    * literal or one broadcast row, so the plan is a projection over the
    * scan at any corpus size. End-of-string probes truncate (a probe of
    * length n sees the shorter remaining suffix); a truncated probe can
    * only match a vocab entry that consumes the entire tail, so token
    * counts are unaffected — the oracle replays the same contract.
    */
  def vocabTokenStats(t: Column, vmap: Column, maxLen: Int): Column = {
    require(maxLen >= 1, "maxLen must be >= 1")
    val lt = lower(t)
    val init = struct(lit(1L).as("next"), lit(0L).as("cnt"),
      lit(0L).as("fb"))
    val positions = when(length(lt) > 0,
      sequence(lit(1L), length(lt).cast("long")))
      .otherwise(array().cast("array<bigint>"))
    val folded = aggregate(positions, init, (a, i) => {
      val active = i === a.getField("next")
      val probes = (maxLen to 1 by -1).map { n =>
        when(element_at(vmap, lt.substr(i.cast("int"), lit(n)))
          .isNotNull, lit(n.toLong))
      }
      val l = coalesce(probes :+ lit(1L): _*)
      val matched = coalesce(probes: _*).isNotNull
      struct(
        when(active, i + l).otherwise(a.getField("next")).as("next"),
        when(active, a.getField("cnt") + 1)
          .otherwise(a.getField("cnt")).as("cnt"),
        when(active && !matched, a.getField("fb") + 1)
          .otherwise(a.getField("fb")).as("fb"))
    })
    struct(folded.getField("cnt").as("vocab_tokens"),
      folded.getField("fb").as("fallback_tokens"))
  }

  def vocabTokenCount(t: Column, vmap: Column, maxLen: Int): Column =
    vocabTokenStats(t, vmap, maxLen).getField("vocab_tokens")

  /** BPE ENCODE with a trained merge list (the consumer of
    * [[graft.operators.Tokenizer.bpeTrain]]'s output): each word becomes
    * its character sequence, then every merge applies in rank order under
    * the exact contract training uses — symbols in a single-space-joined
    * string with sentinel spaces, `replace(" a b ", " ab ")` applied
    * TWICE per merge (one pass misses occurrences whose leading space the
    * preceding replacement consumed; blocked occurrences are never
    * adjacent, so the second pass reaches the fixpoint). Because encode
    * and train share the contract verbatim, a corpus encoded with its own
    * trained merges reproduces training's word segmentations exactly.
    * Returns the document's token array (per-word segmentations
    * flattened in word order). Merges are plan-time literals — the merge
    * table is vocab-sized (hundreds of rows), a broadcast-dim-scale
    * driver read, and baking it into the expression keeps the encode a
    * zero-join zero-shuffle single-pass projection (the per-word lambda
    * evaluates as a native interpreted expression; the nested replaces
    * inside it are ordinary scalar functions).
    */
  def bpeEncode(t: Column, merges: Seq[(String, String)]): Column = {
    val perWord = transform(words(t), w => {
      val sym0 = concat(lit(" "),
        array_join(array_remove(split(w, ""), ""), " "), lit(" "))
      val sym = merges.foldLeft(sym0) { case (s, (a, b)) =>
        val needle = lit(s" $a $b ")
        val repl = lit(s" $a$b ")
        replace(replace(s, needle, repl), needle, repl)
      }
      split(trim(sym), " ")
    })
    flatten(perWord)
  }

  /** Code-vs-prose routing metrics (the StarCoder-style triage BEFORE
    * language ID — t3's stopword n-grams assume natural language, and a
    * code file scores as gibberish there): per-row, zero-shuffle
    * structural signals — code-symbol density ({}[]();=<>), the fraction
    * of lines that are indented (2+ spaces or a tab), the fraction
    * ending in ';' or '{', and programming-keyword hits per word. The
    * verdict is a literal rule over the metrics (tune per corpus); every
    * count is regexp/array arithmetic an independent engine replays.
    */
  def codeMetrics(t: Column): Column = {
    val n = greatest(length(t), lit(1)).cast("double")
    val lines = filter(split(t, "\n"), l => length(l) > 0)
    val nl = greatest(size(lines), lit(1)).cast("double")
    val symbols = (length(t) -
      length(regexp_replace(t, "[{}\\[\\]();=<>]", ""))).cast("double")
    val indented = size(filter(lines,
      l => l.rlike("^(  |\\t)"))).cast("double")
    val eol = size(filter(lines,
      l => l.rlike("[;{]\\s*$"))).cast("double")
    val kws = Seq("def", "return", "import", "class", "for", "while",
      "if", "else", "function", "var", "val", "let", "const", "public",
      "static", "void", "int", "new")
    val kwHits = size(filter(words(t),
      w => w.isin(kws.map(x => x: Any): _*))).cast("double")
    val nw = greatest(size(words(t)), lit(1)).cast("double")
    struct(
      round(symbols / n, 6).as("symbol_ratio"),
      round(indented / nl, 6).as("indent_ratio"),
      round(eol / nl, 6).as("eol_ratio"),
      round(kwHits / nw, 6).as("keyword_ratio"),
      (symbols / n > 0.02 && (indented / nl > 0.2 || eol / nl > 0.2 ||
        kwHits / nw > 0.05)).as("is_code"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. — the code-training
    * data augmentation): the document's words split at two DETERMINISTIC
    * md5-drawn cut points into prefix/middle/suffix and re-render in PSM
    * order `<PRE>prefix<SUF>suffix<MID>middle`, so the model learns to
    * infill. The draw is the q13 retry-stable rule — the same doc gets
    * the same cuts on any engine, retry, or epoch (vary `salt` per epoch
    * to redraw); pure per-row expression, zero shuffle. Documents with
    * under 3 words pass through unchanged (fim = original text).
    */
  def fimSplit(t: Column, id: Column, salt: String): Column = {
    val ws = words(t)
    val k = size(ws)
    def draw(tag: String) =
      graft.operators.Sampling.hashDraw(id, salt + tag)
    val c1 = (draw("a") % k.cast("long")).cast("int")
    val c2 = (draw("b") % k.cast("long")).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val join = (a: Column) => array_join(a, " ")
    when(k < 3, t).otherwise(concat(
      lit("<PRE>"), join(slice(ws, lit(1), lo)),
      lit("<SUF>"), join(slice(ws, hi + 1, k - hi)),
      lit("<MID>"), join(slice(ws, lo + 1, hi - lo))))
  }

  /** Query parameters dropped by [[canonicalUrl]]: the cross-site tracking
    * keys every crawl pipeline strips before URL-level dedup (utm_* plus
    * the google/facebook click ids) — they vary per referral, not per page.
    */
  val trackingParamPattern = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="

  /** Canonical URL for crawl dedup (the URL-normalization pass every
    * CommonCrawl-scale pipeline runs before exact URL dedup): lowercase
    * scheme and host, drop the fragment, drop scheme-default ports
    * (http:80 / https:443), drop tracking query params
    * ([[trackingParamPattern]]), sort the surviving query params
    * byte-wise, and drop an empty trailing '?'. Path case and encoding
    * are preserved (paths ARE case-sensitive). Pure native expressions —
    * codegen'd, replayable in the DuckDB oracle with the same regex/list
    * steps.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host = when(
      (scheme === "http" && hostPort.endsWith(":80")) ||
        (scheme === "https" && hostPort.endsWith(":443")),
      regexp_replace(hostPort, ":[0-9]+$", "")).otherwise(hostPort)
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val query = when(noFrag.contains("?"),
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => length(p) > 0 && !p.rlike(trackingParamPattern))), "&")
    concat(scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(kept === "", "").otherwise(concat(lit("?"), kept)))
  }

  /** Line-level boilerplate predicate (jusText/trafilatura-style
    * heuristics, the rule subset expressible as pure column ops): a line
    * is boilerplate when it is (a) a nav bar — two or more ' | '
    * separators and at most 8 words, (b) a copyright footer — contains
    * '©' or 'all rights reserved', or (c) a bare nav link — at most
    * 3 words, every word starting uppercase, no sentence punctuation.
    */
  def isBoilerplateLine(line: Column): Column = {
    val l = trim(line)
    val words = size(regexp_extract_all(l, lit("\\S+"), lit(0)))
    val navBar = (size(split(l, " \\| ")) >= 3) && (words <= 8)
    val copyright = l.contains("©") ||
      lower(l).contains("all rights reserved")
    val navLink = (words <= 3) && (words >= 1) &&
      l.rlike("^([A-Z]\\S*)( [A-Z]\\S*){0,2}$") && !l.rlike("[.!?]")
    navBar || copyright || navLink
  }

  /** Strip boilerplate lines from a page: returns
    * struct(clean_text, n_removed). One split + one filter per row —
    * no shuffle, no UDF, no JVM object churn beyond the line array; the
    * whole pass is a single projection over the corpus scan (the filter
    * lambda evaluates as a native interpreted expression, everything
    * else codegens).
    */
  def stripBoilerplate(page: Column): Column = {
    val lines = split(page, "\n")
    val kept = filter(lines, l => !isBoilerplateLine(l))
    struct(
      array_join(kept, "\n").as("clean_text"),
      (size(lines) - size(kept)).cast("long").as("n_removed"))
  }

  /** Unicode-script composition of a document — the routing signal that
    * runs BEFORE language ID in a multilingual crawl (t3's [a-z] n-gram
    * heuristic is only meaningful once a doc is known to be
    * Latin-script): per-script character counts as length-difference
    * probes (the t20 pattern — one regexp_replace per script class,
    * pure codegen'd projection, zero shuffle) over the Basic
    * Multilingual Plane ranges for Latin letters, digits, CJK unified
    * ideographs + kana, Cyrillic, Arabic and Greek, plus each class's
    * fraction of non-whitespace characters. Both engines count code
    * points, so the arithmetic replays exactly.
    */
  def scriptCounts(t: Column): Column = {
    def nOf(pattern: String): Column =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    val latin = nOf("[A-Za-z]")
    val digit = nOf("[0-9]")
    val cjk = nOf("[一-鿿぀-ヿ]")
    val cyr = nOf("[Ѐ-ӿ]")
    val arab = nOf("[؀-ۿ]")
    val greek = nOf("[Ͱ-Ͽ]")
    val ws = (length(t) -
      length(regexp_replace(t, "\\s", ""))).cast("long")
    val denom = length(t).cast("long") - ws
    def frac(n: Column): Column =
      when(denom > 0, round(n.cast("double") / denom, 5))
    struct(
      length(t).cast("long").as("n_chars"),
      latin.as("n_latin"), digit.as("n_digit"), cjk.as("n_cjk"),
      cyr.as("n_cyrillic"), arab.as("n_arabic"), greek.as("n_greek"),
      frac(latin).as("latin_frac"), frac(cjk).as("cjk_frac"),
      frac(cyr).as("cyrillic_frac"))
  }
}
