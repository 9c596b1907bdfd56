"""CLI checkpoint interchange: import-checkpoint -> export-checkpoint must
round-trip a reference state_dict exactly (the operator-facing migration
path, both directions)."""

import json
import os

import numpy as np
import pytest
import torch
import torch.nn as nn_t
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.cli import main
from multimodalsimilar_tpu.models.bert import BertConfig


def test_cli_import_then_export_roundtrip(tmp_path, capsys):
    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")

    class TorchNlp(nn_t.Module):
        """reference NlpClassifier key layout (ptm + classifier.weight)."""

        def __init__(self):
            super().__init__()
            self.ptm = BertModel(hf)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(7, cfg.hidden_size))

    torch.manual_seed(0)
    sd = TorchNlp().state_dict()
    sd_path = str(tmp_path / "ref.pt")
    torch.save(sd, sd_path)
    ckpt = str(tmp_path / "ckpt")
    main(["import-checkpoint", "--kind", "nlp", "--state_dict", sd_path,
          "--out", ckpt, "--bert_preset", "tiny"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["imported"] == "nlp"
    assert os.listdir(ckpt)

    exported = str(tmp_path / "back.pt")
    main(["export-checkpoint", "--kind", "nlp", "--checkpoint", ckpt,
          "--out", exported, "--bert_preset", "tiny"])
    back = torch.load(exported, weights_only=True)
    # every weight that exists in the source must round-trip exactly
    for k, v in sd.items():
        assert k in back, k
        np.testing.assert_array_equal(back[k].numpy(), v.numpy(), err_msg=k)


def test_cli_import_into_populated_dir_fails_fast(tmp_path, capsys):
    """Regression: importing step-0 weights into a directory holding a
    previous run's LATER steps used to leave them in place — restore()
    picks latest_step, silently serving the old model instead of the
    imported one. Must fail fast; --overwrite clears explicitly."""
    from multimodalsimilar_tpu.train.checkpoint import CheckpointManager

    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")

    class TorchNlp(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.ptm = BertModel(hf)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(7, cfg.hidden_size))

    torch.manual_seed(1)
    sd_path = str(tmp_path / "ref.pt")
    torch.save(TorchNlp().state_dict(), sd_path)
    ckpt = str(tmp_path / "ckpt")
    stale = {"params": {"w": np.ones(3, np.float32)}}
    CheckpointManager(ckpt).save(1000, stale, force=True)

    with pytest.raises(SystemExit, match="shadowed"):
        main(["import-checkpoint", "--kind", "nlp", "--state_dict",
              sd_path, "--out", ckpt, "--bert_preset", "tiny"])
    # stale step untouched by the refused run
    assert CheckpointManager(ckpt).latest_step() == 1000

    main(["import-checkpoint", "--kind", "nlp", "--state_dict", sd_path,
          "--out", ckpt, "--bert_preset", "tiny", "--overwrite"])
    capsys.readouterr()
    mgr = CheckpointManager(ckpt)
    assert mgr.latest_step() == 0  # the import IS the latest now
    restored = mgr.restore()
    # the imported tree (ArcFace head present), not the stale stub
    assert "head" in restored["params"] and "w" not in restored["params"]


def test_cli_export_vit_backbone_rejected(tmp_path):
    with pytest.raises(SystemExit, match="ViT"):
        main(["export-checkpoint", "--kind", "cv", "--checkpoint", "x",
              "--out", str(tmp_path / "o.pt"), "--backbone", "vit_small"])
    with pytest.raises(SystemExit, match="ViT"):
        main(["export-checkpoint", "--kind", "cv", "--checkpoint", "x",
              "--out", str(tmp_path / "o.pt"), "--backbone",
              "convnext_tiny"])
    # the guard dispatches on config type, not name strings: 'tiny' (the
    # 3-block EfficientNet test backbone) must pass the guard and proceed
    # to the checkpoint restore (which fails on the bogus path, not the
    # backbone check)
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["export-checkpoint", "--kind", "cv", "--checkpoint",
              str(tmp_path / "nope"), "--out", str(tmp_path / "o.pt"),
              "--backbone", "tiny"])
