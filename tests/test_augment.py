"""Augmentation-registry tests (M12/M13 semantics, seeded determinism)."""

import random

from ocr_dataset_builder_ray.functions import augment as ag

SAMPLE = (
    "This is the first sentence. It is a good sentence.\n"
    "This is the second line, which also forms a sentence.\n"
    "A third line here. And perhaps a fourth one? Yes!\n"
    "Final line for testing purposes."
)


def test_registry_has_ten_profiles():
    assert len(ag.PROFILES) == 10
    assert ag.PROFILE_NAMES == sorted(ag.PROFILES)


def test_profiles_deterministic_per_key():
    for name in ag.PROFILE_NAMES:
        a = ag.apply_profile(name, SAMPLE, "https://x.example/p/1")
        b = ag.apply_profile(name, SAMPLE, "https://x.example/p/1")
        assert a == b, name
    # different key -> (almost surely) different noise for noisy profiles
    a = ag.apply_profile("comprehensive", SAMPLE, "key-a")
    b = ag.apply_profile("comprehensive", SAMPLE, "key-b")
    assert a != b


def test_profile_for_key_stable_and_spread():
    names = {ag.profile_for_key(f"url-{i}") for i in range(200)}
    assert names == set(ag.PROFILE_NAMES)  # all profiles reachable
    assert ag.profile_for_key("url-1") == ag.profile_for_key("url-1")


def test_empty_and_short_inputs_safe():
    for name in ag.PROFILE_NAMES:
        assert ag.apply_profile(name, "", "k") == ""
        out = ag.apply_profile(name, "OneWord.", "k")
        assert isinstance(out, str)


def test_primitives_use_real_newlines():
    """The reference joins lines with a literal backslash-n
    (ocr_augmentations.py:82 etc.) — pinned fixed here."""
    rng = random.Random(7)
    out = ag.duplicate_lines("a line\nb line", rng, p=1.0, max_duplicates=1)
    assert "\\n" not in out
    assert out.count("\n") >= 2


def test_delete_words_probability_bounds():
    rng = random.Random(1)
    assert ag.delete_words(SAMPLE, rng, 0.0) == SAMPLE
    assert ag.delete_words(SAMPLE, rng, 1.0) == ""


def test_merge_and_split_line_counts():
    rng = random.Random(3)
    merged = ag.merge_lines("a b\nc d\ne f\ng h", rng, 1.0)
    assert merged.count("\n") == 1  # 4 lines -> 2 pairwise merges
    rng = random.Random(3)
    split = ag.split_lines("a b c d", rng, 1.0)
    assert split.count("\n") == 1


def test_character_noise_only_substitutes_mapped_chars():
    rng = random.Random(5)
    out = ag.character_noise("lllll", rng, 1.0)
    assert all(c in ("1", "|") for c in out) and len(out) == 5


def test_duplicate_partial_lines_modes():
    line = "alpha beta gamma delta"
    for mode in ("words_start", "words_end", "random_ratio"):
        rng = random.Random(11)
        out = ag.duplicate_partial_lines(line, rng, 1.0, mode)
        assert len(out.split()) > len(line.split()), mode


def test_noise_pairs_fixture_shape():
    """FIXTURES §3: (clean, profile, augmented) triples, deterministic."""
    triples = [
        (SAMPLE, name, ag.apply_profile(name, SAMPLE, f"seed:{name}"))
        for name in ag.PROFILE_NAMES
    ]
    again = [
        (SAMPLE, name, ag.apply_profile(name, SAMPLE, f"seed:{name}"))
        for name in ag.PROFILE_NAMES
    ]
    assert triples == again
