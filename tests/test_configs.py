"""Every shipped example config must map onto real flags of its subcommand.

Guards against configs/ drifting from the CLI: each YAML key must be an
attribute the subcommand's parser actually produces (argparse's set_defaults
would silently accept typos otherwise), and one end-to-end run proves the
--config preload path works.
"""

import json
import os

import pandas as pd
import pytest
import yaml

from multimodalsimilar_tpu.cli import build_parser, main

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

CASES = {
    "train_nlp_796.yaml": ["train", "nlp", "--data", "x"],
    "train_nlp_daodian.yaml": ["train", "nlp", "--data", "x"],
    "train_nlp_v2.yaml": ["train", "nlp", "--data", "x"],
    "train_nlp_v2_dist.yaml": ["train", "nlp", "--data", "x"],
    "train_nlp_large_tp.yaml": ["train", "nlp", "--data", "x"],
    "train_nlp_large_pp.yaml": ["train", "nlp", "--data", "x"],
    "train_multilabel_v3.yaml": ["train", "multilabel", "--data", "x"],
    "train_cv_daodian.yaml": ["train", "cv", "--data", "x",
                              "--img_root", "x"],
    "train_cv_timm.yaml": ["train", "cv", "--data", "x", "--img_root", "x"],
    "train_multimodal.yaml": ["train", "multimodal", "--data", "x",
                              "--img_root", "x"],
    "train_pair.yaml": ["train", "pair", "--data", "x"],
    "train_fasttext.yaml": ["train", "fasttext", "--data", "x"],
    "similar_nlp.yaml": ["similar", "nlp", "--data", "x"],
    "similar_daodian_v1.yaml": ["similar", "daodian", "--data", "x",
                                "--fasttext_model", "x"],
    "similar_daodian_v2_recent_days.yaml": [
        "similar", "daodian", "--data", "x", "--fasttext_model", "x"],
    "embed_incremental_bert.yaml": ["embed", "incremental", "--data", "x",
                                    "--table", "x"],
    "embed_bulk.yaml": ["embed", "bulk", "--data", "x", "--table", "x"],
    "serve.yaml": ["serve", "--data", "x"],
    "serve_cv.yaml": ["serve", "--data", "x"],
    "serve_multimodal.yaml": ["serve", "--data", "x"],
    "serve_fasttext.yaml": ["serve", "--data", "x"],
    "serve_daodian.yaml": ["serve", "--data", "x"],
}


def test_every_config_has_a_case():
    files = {f for f in os.listdir(ROOT) if f.endswith(".yaml")}
    assert files == set(CASES), "update CASES for new/removed configs"


@pytest.mark.parametrize("fname", sorted(CASES))
def test_config_keys_are_real_flags(fname):
    parser = build_parser()
    args = parser.parse_args(CASES[fname])
    cfg = yaml.safe_load(open(os.path.join(ROOT, fname)))
    missing = [k for k in cfg if not hasattr(args, k)]
    assert not missing, f"{fname}: unknown flags {missing}"


def test_config_preload_end_to_end(tmp_path, capsys):
    """--config values land; explicit flags still win (tiny run)."""
    df = pd.DataFrame({
        "spuname": [f"{'甲乙'[i % 2] * 3}商品{i}" for i in range(32)],
        "category_name_id": [i % 2 for i in range(32)]})
    data = str(tmp_path / "t.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "nlp", "--config",
          os.path.join(ROOT, "train_nlp_796.yaml"),
          "--data", data, "--output", out,
          # overrides (the YAML says base/256/128 — too big for a test)
          "--bert_preset", "tiny", "--batch_size", "16",
          "--max_length", "12", "--epochs", "1", "--log_every", "1",
          "--eval_every", "1000000", "--save_every", "4"])
    # text_col/label_col came from the YAML (spuname/category_name_id)
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines


def test_yaml_unknown_key_dies_with_clear_error(tmp_path):
    """A mistyped YAML key must die with the unknown-flags message, not
    argparse's bare 'unrecognized arguments' (advisor finding)."""
    import yaml as _yaml

    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump({"batch_sise": 32}, f)        # typo
    with pytest.raises(SystemExit, match="unknown flags.*batch_sise"):
        main(["train", "nlp", "--config", cfg_path, "--data", "x.csv"])


def test_yaml_value_starting_with_dash_not_misparsed(tmp_path, capsys):
    """A YAML string value beginning with '-' must inject as --key=value,
    not as a separate argv token argparse reads as a flag (advisor
    finding). --dt is compared digit-normalized, so '-2026-08-16' selects
    the same rows as '2026-08-16'."""
    df = pd.DataFrame({"spu_name": [f"商品{i}" for i in range(8)],
                       "spu_sn": [f"s{i}" for i in range(8)],
                       "dt": ["2026-08-16"] * 8})
    data = str(tmp_path / "t.csv")
    df.to_csv(data, index=False)
    import yaml as _yaml
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump({"dt": "-2026-08-16", "max_length": 8,
                         "batch_size": 8}, f)
    main(["similar", "nlp", "--config", cfg_path, "--data", data])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"] == 8


def test_explicit_equals_form_beats_yaml(tmp_path):
    """--flag=value and exact --flag forms must win over the YAML; prefix
    abbreviations are rejected outright (allow_abbrev=False) so they can
    never silently collide with YAML keys."""
    import yaml as _yaml

    from multimodalsimilar_tpu.cli import _apply_yaml_config, build_parser

    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump({"epochs": 30, "batch_size": 256}, f)
    parser = build_parser()
    argv = ["train", "nlp", "--data", "x", "--config", cfg_path,
            "--epochs=5"]
    args = parser.parse_args(argv)
    _apply_yaml_config(args, argv)
    assert args.epochs == 5            # explicit --epochs=5 wins
    assert args.batch_size == 256      # YAML fills the rest
    with pytest.raises(SystemExit):    # abbreviation refused, not matched
        parser.parse_args(["train", "nlp", "--data", "x", "--epoch", "5"])


def test_yaml_config_satisfies_required_flags(tmp_path):
    """Review fix: --config used to be applied AFTER parse_args, so
    required flags (--data, ...) could never come from the YAML despite
    the module docstring's promise. They now inject pre-parse."""
    import pandas as pd
    import yaml

    from multimodalsimilar_tpu.cli import main

    data = str(tmp_path / "d.csv")
    pd.DataFrame({"spu_name": [f"商品{i}" for i in range(24)],
                  "labels": [i % 3 for i in range(24)]}).to_csv(
        data, index=False)
    cfg = {"data": data, "output": str(tmp_path / "out"),
           "batch_size": 8, "epochs": 1, "max_length": 8,
           "eval_every": 10**9, "save_every": 4, "log_every": 10**9,
           "no_clean": True}
    cfg_path = str(tmp_path / "job.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["train", "nlp", "--config", cfg_path])       # no --data on argv
    import os
    assert os.listdir(os.path.join(str(tmp_path / "out"), "ckpt"))


def test_unsupported_flags_fail_loud(tmp_path):
    """--fused_loss/--remat on tasks that cannot honor them must error,
    not silently no-op (review finding)."""
    import pandas as pd
    import pytest

    from multimodalsimilar_tpu.cli import main

    data = str(tmp_path / "d.csv")
    pd.DataFrame({"goods_sku": ["1"], "tag_new_id": [0]}).to_csv(
        data, index=False)
    with pytest.raises(SystemExit, match="fused_loss"):
        main(["train", "cv", "--data", data, "--img_root", str(tmp_path),
              "--fused_loss"])
