"""Instruction preprocessing end-to-end (preprocessing/preprocess_instructions.py).

The reference pipeline (preprocess_instructions.py:101-170) tokenises
annotation strings with the CLIP BPE tokenizer and encodes them with the
CLIP text transformer.  This environment has no network for
``from_pretrained`` downloads, so these tests exercise the REAL
tokenise→encode→pickle path with a locally-built byte-level BPE vocab and
a randomly-initialised ``CLIPTextModel`` — same classes, same shapes,
offline weights.
"""

import json
import pickle

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from act3d_tpu.preprocessing.preprocess_instructions import (  # noqa: E402
    encode_instructions,
    load_annotations,
    main,
)


@pytest.fixture(scope="module")
def clip_pair(tmp_path_factory):
    """A working offline (tokenizer, model) pair with CLIP's real classes."""
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTokenizer
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    tmp = tmp_path_factory.mktemp("clip_vocab")
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for ch in chars:
        vocab[ch] = len(vocab)
    for ch in chars:
        vocab[ch + "</w>"] = len(vocab)
    for special in ("<|startoftext|>", "<|endoftext|>"):
        vocab[special] = len(vocab)
    (tmp / "vocab.json").write_text(json.dumps(vocab))
    (tmp / "merges.txt").write_text("#version: 0.2\n")
    tokenizer = CLIPTokenizer(str(tmp / "vocab.json"), str(tmp / "merges.txt"))

    config = CLIPTextConfig(
        vocab_size=len(vocab),
        hidden_size=512,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        max_position_embeddings=77,
    )
    import torch

    torch.manual_seed(0)
    model = CLIPTextModel(config)
    model.eval()
    return tokenizer, model


def test_encode_instructions_shapes(clip_pair):
    tokenizer, model = clip_pair
    feats = encode_instructions(
        ["pick", "lift it"], tokenizer=tokenizer, model=model
    )
    assert feats.shape == (2, 53, 512)
    assert feats.dtype == np.float32
    assert np.isfinite(feats).all()
    # deterministic for fixed weights
    feats2 = encode_instructions(
        ["pick", "lift it"], tokenizer=tokenizer, model=model
    )
    np.testing.assert_array_equal(feats, feats2)


def test_too_long_instruction_raises(clip_pair):
    tokenizer, model = clip_pair
    with pytest.raises(RuntimeError, match="Too long"):
        encode_instructions(
            ["x" * 200], tokenizer=tokenizer, model=model
        )


def test_full_pipeline_to_training_pkl(clip_pair, tmp_path):
    """annotations.json -> main() -> instructions.pkl consumed by the
    training loader (utils/registry.load_instructions) and the dataset."""
    tokenizer, model = clip_pair
    annotations = [
        {"task": "pick_and_lift", "variation": 0,
         "instructions": ["pick it", "grab the cube"]},
        {"task": "pick_and_lift", "variation": 1,
         "instruction": "lift it up"},
        {"task": "push_button", "variation": 0,
         "instructions": ["push"]},
    ]
    ann_path = tmp_path / "annotations.json"
    ann_path.write_text(json.dumps(annotations))

    parsed = load_annotations(ann_path)
    assert parsed["pick_and_lift"][0] == ["pick it", "grab the cube"]
    assert parsed["pick_and_lift"][1] == ["lift it up"]

    out = tmp_path / "instructions.pkl"
    main(
        [
            "--tasks", "pick_and_lift", "push_button",
            "--variations", "0",
            "--annotations", str(ann_path),
            "--output", str(out),
        ],
        tokenizer=tokenizer,
        model=model,
    )
    blob = pickle.loads(out.read_bytes())
    assert blob["pick_and_lift"][0].shape == (2, 53, 512)
    assert blob["push_button"][0].shape == (1, 53, 512)

    from act3d_tpu.utils.registry import load_instructions

    instr = load_instructions(
        str(out), tasks=("pick_and_lift",), variations=(0,)
    )
    assert set(instr.keys()) == {"pick_and_lift"}
    assert instr["pick_and_lift"][0].shape == (2, 53, 512)
