package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextNormalizerSpec extends AnyFunSuite {

  test("greek letters become latin names (NLP.py:165-214)") {
    assert(TextNormalizer.normalize("TNF-α levels") == "TNF-alpha levels")
    assert(TextNormalizer.normalize("β-catenin") == "beta-catenin")
    assert(TextNormalizer.normalize("Ω and ω") == "Omega and omega")
    assert(TextNormalizer.normalize("λ phage") == "lamda phage") // reference spelling
  }

  test("whitespace runs squashed") {
    assert(TextNormalizer.normalize("Molecular      genetics and\t\tstudies") ==
      "Molecular genetics and studies")
  }

  test("accents folded to ascii") {
    assert(TextNormalizer.normalize("Crohn's disease in Besançon, naïve café") ==
      "Crohn's disease in Besancon, naive cafe")
    assert(TextNormalizer.normalize("α-synuclein") == "alpha-synuclein")
  }

  test("output is pure ascii") {
    val s = TextNormalizer.normalize("μg/mL × 10⁷ units – ‘quoted’ ß")
    assert(s.forall(_ < 128), s)
  }
}
