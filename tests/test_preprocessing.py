"""Preprocessing builders + predict CLI end-to-end."""

import io
import json
import os

import numpy as np

from mmt_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, build_example, parse_example
from tests.test_data_pipeline import VOCAB, make_vocab, png_bytes


def paired_flickr_records(path, n_images, rng):
    """Reference-input-format records: image/key, image/encoded, captions."""
    with TFRecordWriter(path) as w:
        for i in range(n_images):
            captions = [f"caption {j} for image {i}".encode() for j in range(5)]
            w.write(
                build_example(
                    {
                        "image/key": [f"im{i}".encode()],
                        "image/encoded": [png_bytes(rng)],
                        "caption/tokenized_text": captions,
                    }
                )
            )


class TestFlickr30kBuilder:
    def test_builds_indices_and_meta(self, tmp_path):
        from mmt_tpu.preprocessing.flickr30k import main

        rng = np.random.default_rng(0)
        src = str(tmp_path / "flickr30k.val.recordio")
        paired_flickr_records(src, 4, rng)
        out = str(tmp_path / "out")
        main([
            "--input_files=" + str(tmp_path / "flickr30k.{}.recordio"),
            f"--eval_data_dir={out}",
            "--topk_images=3",
            "--splits=val",
        ])
        with open(os.path.join(out, "input_meta_data")) as f:
            meta = json.load(f)
        assert meta["val_num_image_examples"] == 3  # topk subsample
        assert meta["val_num_text_examples"] == 20  # 4 images x 5 captions
        texts = [
            parse_example(p)
            for p in TFRecordReader(meta["val_text_input_path"])
        ]
        # Captions of the 4th image have gt -1 (image not in topk pool).
        gts = [t["gt_image_index"][0] for t in texts]
        assert gts[:15] == [0] * 5 + [1] * 5 + [2] * 5
        assert gts[15:] == [-1] * 5

    def test_wit_dedup(self, tmp_path):
        from mmt_tpu.preprocessing.wit import main

        rng = np.random.default_rng(1)
        src = str(tmp_path / "wit.val.recordio")
        with TFRecordWriter(src) as w:
            for doc, caption in [("a", "x"), ("a", "y"), ("b", "z"), ("a", "x")]:
                w.write(
                    build_example(
                        {
                            "canonical_doc_id": [doc.encode()],
                            "image_data": [png_bytes(rng)],
                            "caption_attribution_description": [caption.encode()],
                        }
                    )
                )
        out = str(tmp_path / "wout")
        main([
            "--input_files=" + str(tmp_path / "wit.{}.recordio"),
            f"--eval_data_dir={out}",
            "--splits=val",
        ])
        with open(os.path.join(out, "input_meta_data")) as f:
            meta = json.load(f)
        assert meta["val_num_image_examples"] == 2  # a, b deduped
        assert meta["val_num_text_examples"] == 3  # duplicate (a, x) dropped


class TestPredictCli:
    def test_predict_cli_end_to_end(self, tmp_path):
        """meta json + checkpoint + records -> results.csv/recall.json."""
        import jax

        from mmt_tpu.cli.predict import main as predict_main
        from mmt_tpu.configs import (
            ClsHeadConfig,
            ClassificationModelConfig,
            ClassificationTaskConfig,
            MmtRetrievalDataConfig,
            TrainerConfig,
        )
        from mmt_tpu.configs.encoder import EncoderConfig, MmtEncoderConfig
        from mmt_tpu.data.loaders import MmtRetrievalLoader
        from mmt_tpu.train.checkpoint import CheckpointManager
        from mmt_tpu.train.tasks import ClassificationTask
        from tests.test_data_pipeline import data_kwargs, write_records

        rng = np.random.default_rng(0)
        vocab = make_vocab(tmp_path)
        imgs = str(tmp_path / "img.tfrecord")
        txts = str(tmp_path / "txt.tfrecord")
        write_records(imgs, 2, rng, with_indices=True, image_only=True)
        write_records(txts, 4, rng, with_indices=True, text_only=True)

        meta = {
            "max_seq_length": 32,
            "test_image_input_path": imgs,
            "test_text_input_path": txts,
            "test_num_image_examples": 2,
            "test_num_text_examples": 4,
        }
        meta_path = str(tmp_path / "meta.json")
        with open(meta_path, "w") as f:
            json.dump(meta, f)

        # Save a checkpoint with the tiny geometry; override as yaml.
        import yaml as yamllib

        enc_override = yamllib.safe_dump(
            {
                "task": {
                    "model": {
                        "encoder": {
                            "mmt": {
                                "vocab_size": 40,
                                "hidden_size": 32,
                                "num_hidden_layers": 1,
                                "num_attention_heads": 2,
                                "intermediate_size": 64,
                                "relative_pos_max_distance": 3,
                                "relative_vocab_size": 12,
                                "relative_att_num_core_layers": 1,
                                "compute_dtype": "float32",
                                "hidden_dropout_prob": 0.0,
                                "attention_probs_dropout_prob": 0.0,
                            }
                        },
                        "cls_heads": [
                            {"inner_dim": 32, "num_classes": 2, "name": "itm"}
                        ],
                    },
                    "train_data": {
                        "vocab_filename": vocab,
                        "image_size": 32,
                        "patch_size": 16,
                        "max_seq_len": 32,
                    },
                }
            }
        )

        data_cfg = MmtRetrievalDataConfig(
            **data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                          global_batch_size=8, is_training=False)
        )
        enc = MmtEncoderConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            relative_pos_max_distance=3, relative_vocab_size=12,
            relative_att_num_core_layers=1, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, compute_dtype="float32",
        )
        task = ClassificationTask(
            ClassificationTaskConfig(
                model=ClassificationModelConfig(
                    encoder=EncoderConfig(mmt=enc),
                    cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
                ),
                train_data=data_cfg,
            ),
            TrainerConfig(),
        )
        first = next(iter(MmtRetrievalLoader(data_cfg).load()))
        params = task.init(jax.random.PRNGKey(0), first)
        ckpt_dir = str(tmp_path / "ckpt")
        CheckpointManager(ckpt_dir).save(1, jax.device_get(params))

        out_dir = str(tmp_path / "pred")
        predict_main([
            f"--input_meta_data_path={meta_path}",
            "--predict_split=test",
            f"--init_checkpoint={ckpt_dir}",
            f"--test_output_dir={out_dir}",
            "--predict_global_batch_size=8",
            f"--params_override={enc_override}",
        ])
        assert os.path.exists(os.path.join(out_dir, "results.csv"))
        with open(os.path.join(out_dir, "recall.json")) as f:
            recall = json.load(f)
        assert len(recall) == 8


class TestFashionGenCandidates:
    def test_candidate_pools(self, tmp_path):
        from mmt_tpu.preprocessing.fashion_gen import build_candidates

        info = tmp_path / "info.txt"
        lines = []
        for i in range(40):
            lines.append(
                "\x01".join(
                    [f"main{i}", f"img{i}", "cat", "x", "subcat", "y",
                     f"description of product {i}"]
                )
            )
        info.write_text("\n".join(lines) + "\n")

        csv_path = str(tmp_path / "i2t.csv")
        n = build_candidates(str(info), "i2t", csv_path,
                             num_queries=5, pool_size=11, seed=1)
        import pandas as pd

        df = pd.read_csv(csv_path)
        assert len(df) == n
        # 5 query images x 11 candidate texts each (minus rare gt dropout).
        assert df["image_index"].nunique() == 5
        per_query = df.groupby("image_index").size()
        assert set(per_query) <= {10, 11}
        # Each pool contains its ground truth (gt == the query image) at
        # most once; missing gt -> -1 entries allowed.
        hits = df[df["gt_image_index"] == df["image_index"]]
        assert hits.groupby("image_index").size().max() == 1
        # The recall computation consumes this CSV shape directly.
        from mmt_tpu.eval.recall import get_recall_at_k_from_dataframe

        df["output"] = (df["gt_image_index"] == df["image_index"]).astype(float)
        recall = get_recall_at_k_from_dataframe(df)
        assert recall["i2t @  1"] == "1.0000"  # oracle scores -> perfect recall


class TestFashionGenMetadata:
    """`metadata` subcommand vs the reference notebook's own code.

    Pool-shape analog of the reference facts (989 pools of 101 + 11 of
    100, gt -1 when the ground truth is absent): 4 query pools of 6
    candidates + 2 pools of 5, one i2t text with no gt anywhere.
    """

    @staticmethod
    def _raw_pairs(tmp_path, task):
        import pandas as pd

        rows = []
        # Products p00..p11; product pNN's image files are pNN_0 / pNN_1.
        pools = {
            "i2t": {  # query IMAGE (prod, img) -> candidate text prods
                ("p00", "0"): ["p00", "p01", "p02", "p03", "p04", "p05"],
                ("p01", "0"): ["p01", "p02", "p03", "p04", "p05", "p06"],
                # p10's own text never pairs with a p10 image -> gt -1.
                ("p02", "1"): ["p02", "p03", "p04", "p05", "p06", "p10"],
                ("p03", "0"): ["p03", "p04", "p05", "p06", "p07", "p08"],
                ("p04", "0"): ["p04", "p05", "p06", "p07", "p08"],
                ("p05", "1"): ["p05", "p06", "p07", "p08", "p09"],
            },
            "t2i": {  # query TEXT prod -> candidate images (prod, img)
                "p00": [("p00", "0"), ("p01", "0"), ("p02", "0"),
                        ("p03", "0"), ("p04", "0"), ("p05", "0")],
                "p01": [("p01", "1"), ("p02", "0"), ("p03", "1"),
                        ("p04", "0"), ("p05", "0"), ("p06", "0")],
                "p02": [("p02", "0"), ("p03", "0"), ("p04", "0"),
                        ("p05", "0"), ("p06", "0"), ("p07", "0")],
                "p03": [("p03", "0"), ("p04", "1"), ("p05", "0"),
                        ("p06", "0"), ("p07", "0"), ("p08", "0")],
                "p04": [("p04", "0"), ("p05", "0"), ("p06", "0"),
                        ("p07", "0"), ("p08", "0")],
                "p05": [("p05", "0"), ("p06", "0"), ("p07", "0"),
                        ("p08", "0"), ("p09", "0")],
            },
        }[task]
        if task == "i2t":
            for (iprod, img), texts in pools.items():
                for t in texts:
                    rows.append((iprod, img, t))
        else:
            for tprod, images in pools.items():
                for iprod, img in images:
                    rows.append((iprod, img, tprod))
        df = pd.DataFrame(
            rows, columns=["image_prod_id", "prod_img_id", "text_prod_id"]
        )
        df["desc"] = "description of " + df["text_prod_id"]
        path = str(tmp_path / f"raw_{task}.csv")
        df.to_csv(path, index=False)
        return path

    @staticmethod
    def _notebook_reference(pairs_csv, task):
        """Exec the notebook's add_columns + transcribe its merge cells."""
        import json as _json

        import pandas as pd

        nb = _json.load(
            open("/root/reference/preprocessing/create_fashion_gen_metadata.ipynb")
        )
        cell5 = "".join(nb["cells"][5]["source"])
        ns = {"pd": pd}
        exec(cell5, ns)  # defines add_columns
        df = pd.read_csv(
            pairs_csv,
            dtype={"image_prod_id": str, "prod_img_id": str, "text_prod_id": str},
        )
        df = ns["add_columns"](df)
        gt_df = df[df["gt"] == 1][["text_index", "image_index"]].rename(
            columns={"image_index": "gt_image_index"}
        )
        df = df.merge(gt_df, how="left", on="text_index")
        if task == "i2t":
            df = df.fillna(-1)
            df["gt_image_index"] = df["gt_image_index"].astype(int)
        return df

    def test_differential_vs_notebook(self, tmp_path):
        import pandas as pd

        from mmt_tpu.preprocessing.fashion_gen import build_metadata

        for task in ("i2t", "t2i"):
            pairs = self._raw_pairs(tmp_path, task)
            out = str(tmp_path / f"meta_{task}.csv")
            ours = build_metadata(pairs, task, out)
            ref = self._notebook_reference(pairs, task)
            pd.testing.assert_frame_equal(
                ours.reset_index(drop=True), ref.reset_index(drop=True)
            )
            # Round-trips through the CSV on disk too.
            pd.testing.assert_frame_equal(
                pd.read_csv(out, dtype={c: str for c in
                                        ("image_prod_id", "prod_img_id",
                                         "text_prod_id", "image_id")}),
                ref, check_dtype=False,
            )

    def test_pool_shape_and_gt_rules(self, tmp_path):
        from mmt_tpu.preprocessing.fashion_gen import build_metadata

        i2t = build_metadata(
            self._raw_pairs(tmp_path, "i2t"), "i2t", str(tmp_path / "i.csv")
        )
        # 4 pools of 6 candidates + 2 pools of 5 (989x101/11x100 analog).
        sizes = i2t["image_index"].value_counts()
        assert (sizes == 6).sum() == 4 and (sizes == 5).sum() == 2
        # Every pool's own-product text is a gt pair pointing back at it.
        own = i2t[i2t["gt"] == 1]
        assert (own["gt_image_index"] == own["image_index"]).all()
        # p10's text never pairs with a p10 image anywhere -> -1.
        p10 = i2t[i2t["text_prod_id"] == "p10"]
        assert len(p10) == 1 and (p10["gt_image_index"] == -1).all()

        t2i = build_metadata(
            self._raw_pairs(tmp_path, "t2i"), "t2i", str(tmp_path / "t.csv")
        )
        sizes = t2i["text_index"].value_counts()
        assert (sizes == 6).sum() == 4 and (sizes == 5).sum() == 2
        # t2i: every query text's gt image is in its own pool.
        assert t2i["gt_image_index"].notna().all()
        gt_rows = t2i[t2i["gt"] == 1]
        assert (gt_rows["gt_image_index"] == gt_rows["image_index"]).all()

    def test_feeds_retrieval_builder(self, tmp_path):
        """metadata CSV -> build_retrieval -> records + meta end to end."""
        import pandas as pd

        from mmt_tpu.preprocessing.fashion_gen import (
            build_metadata, build_retrieval,
        )

        meta_csv = str(tmp_path / "i2t.csv")
        df = build_metadata(self._raw_pairs(tmp_path, "i2t"), "i2t", meta_csv)

        rng = np.random.default_rng(7)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        lines = []
        for image_id in sorted(df["image_id"].unique()):
            (img_dir / f"{image_id}.png").write_bytes(png_bytes(rng))
        # txt_info keyed by image_id (main_id \x01 image_id \x01 ...).
        for image_id, prod in df.groupby("image_id")["image_prod_id"].first().items():
            lines.append("\x01".join(
                [prod, image_id, "cat", "1", "sub", "2", f"info text {prod}"]
            ))
        info = tmp_path / "valid_info.txt"
        info.write_text("\n".join(lines) + "\n")

        meta = build_retrieval(
            str(info), str(img_dir), meta_csv, "i2t", str(tmp_path / "eval")
        )
        assert meta["val_num_examples"] == len(df)
        parsed = [
            parse_example(p) for p in TFRecordReader(meta["val_input_path"])
        ]
        assert len(parsed) == len(df)
        got = {(p["image_index"][0], p["text_index"][0]): p["gt_image_index"][0]
               for p in parsed}
        want = {(r.image_index, r.text_index): r.gt_image_index
                for r in df.itertuples()}
        assert got == want
