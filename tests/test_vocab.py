import pandas as pd
import pytest

from apvt_lora.utils.vocab import LabelVocabulary


def test_sorted_construction_and_roundtrip(tmp_path):
    vocab = LabelVocabulary.from_classes(["stop", "yield", "curve", "stop"])
    assert vocab.classes == ("curve", "stop", "yield")
    assert vocab.index_of("stop") == 1
    assert vocab.name_of(2) == "yield"

    path = tmp_path / "class_mappings.txt"
    vocab.save(str(path))
    # Reference format: "{idx}: {name}" per line (train.py:216-219).
    assert path.read_text() == "0: curve\n1: stop\n2: yield\n"
    assert LabelVocabulary.load(str(path)) == vocab


def test_vocab_stable_across_splits():
    """The reference bug (Utils.py:61-65): a split missing a class rebuilt a
    different mapping. Our vocabulary is built once and reused everywhere."""
    train = pd.DataFrame({"unified_class": ["stop", "yield", "curve"]})
    val = pd.DataFrame({"unified_class": ["stop"]})  # missing classes
    vocab = LabelVocabulary.from_metadata_frames([train, val])
    assert vocab.encode(val["unified_class"]) == [vocab.index_of("stop")]
    assert len(vocab) == 3


def test_unknown_class_raises():
    vocab = LabelVocabulary.from_classes(["a"])
    with pytest.raises(KeyError):
        vocab.index_of("b")


def test_duplicate_rejected():
    with pytest.raises(ValueError):
        LabelVocabulary(("a", "a"))
