"""CLIP text tower: parity vs transformers + the device text classifier.

The torch oracle is a randomly-initialized HF ``CLIPTextModelWithProjection``
(no download; same offline pattern as tests/test_clip_vit.py): the converted
flax tower must reproduce its text embeddings to float tolerance — the trust
chain for computing the stage-1 open-vocabulary classifier head on device
(reference analog: detic_labeling_net.py:50-68 ``reset_cls_test``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from partdistillation_tpu.models.clip_text import (  # noqa: E402
    CLIPTextTower,
    convert_clip_text_state_dict,
    text_config_from_hf,
)

VOCAB = 64
EOT = VOCAB - 1  # CLIP convention: End-Of-Text is the top vocabulary id


def _small_hf_text_model():
    cfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, projection_dim=16,
        eos_token_id=EOT, bos_token_id=VOCAB - 2, pad_token_id=0)
    torch.manual_seed(0)
    return transformers.CLIPTextModelWithProjection(cfg).eval()


def _token_ids(rng, batch, length, max_len):
    """(B, max_len) prompts: [bos, words..., EOT, pads]; only one EOT and no
    id above it before the EOT, so HF's eos pooling == argmax pooling."""
    ids = np.zeros((batch, max_len), np.int32)
    ids[:, 0] = VOCAB - 2
    ids[:, 1 : length - 1] = rng.randint(1, VOCAB - 2, (batch, length - 2))
    ids[:, length - 1] = EOT
    return ids


def test_parity_with_transformers():
    hf = _small_hf_text_model()
    cfg = text_config_from_hf(hf.config)
    params = convert_clip_text_state_dict(hf.state_dict(), cfg)

    ids = _token_ids(np.random.RandomState(0), batch=3, length=9, max_len=16)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).text_embeds.numpy()

    got = np.asarray(CLIPTextTower(cfg).apply(params, jnp.asarray(ids)))
    assert got.shape == want.shape == (3, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_padding_does_not_leak_into_pooled_embedding():
    """Causal mask + pad-after-EOT => pooled output is pad-independent."""
    hf = _small_hf_text_model()
    cfg = text_config_from_hf(hf.config)
    params = convert_clip_text_state_dict(hf.state_dict(), cfg)
    tower = CLIPTextTower(cfg)

    ids = _token_ids(np.random.RandomState(1), batch=2, length=6, max_len=16)
    short = ids[:, :6]  # no padding at all
    a = np.asarray(tower.apply(params, jnp.asarray(ids)))
    b = np.asarray(tower.apply(params, jnp.asarray(short)))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


class _StubProcessor:
    """Deterministic word->id tokenizer with the HF processor call contract."""

    def __init__(self, max_len=16):
        self.max_len = max_len

    def __call__(self, text, return_tensors, padding, max_length=None,
                 truncation=False):
        n = max_length or self.max_len
        ids = np.zeros((len(text), n), np.int64)
        for i, prompt in enumerate(text):
            toks = [VOCAB - 2] + [
                hash(w) % (VOCAB - 3) + 1 for w in prompt.split()]
            toks = toks[: n - 1] + [EOT]
            ids[i, : len(toks)] = toks
        out = {"input_ids": ids,
               "attention_mask": (ids != 0).astype(np.int64)}
        if return_tensors == "pt":
            out = {k: torch.from_numpy(v) for k, v in out.items()}
        return out


def test_device_text_classifier_matches_torch_path():
    """clip_text_classifier_device == clip_text_classifier_from on the same
    full CLIPModel weights and tokenization (chunked: batch < num prompts)."""
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_text_classifier_device, clip_text_classifier_from)

    cfg = transformers.CLIPConfig(
        text_config={
            "vocab_size": VOCAB, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "eos_token_id": EOT,
            "bos_token_id": VOCAB - 2, "pad_token_id": 0},
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8},
        projection_dim=16)
    torch.manual_seed(1)
    model = transformers.CLIPModel(cfg).eval()
    processor = _StubProcessor()
    names = ["tabby_cat", "sea snake", "jay", "hen", "freight car"]

    want = clip_text_classifier_from(model, processor, names)
    got = clip_text_classifier_device(model, processor, names, batch=2)
    assert got.shape == want.shape == (5, 16)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones(5), atol=1e-5)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
