"""Tests for the retrieval/generation data pipelines.

Parity targets: `/root/reference/retrieval/datamodule.py` (flattening,
negative sampling, label matrix) and
`/root/reference/generation/datamodule.py` (pairs, augmentation, -100
masking).
"""

import numpy as np
import pytest

from reprover_tpu.data import Premise
from reprover_tpu.retrieval.datamodule import (
    Loader,
    RetrievalDataModule,
    RetrievalDataset,
)
from reprover_tpu.generation.datamodule import (
    GeneratorDataModule,
    GeneratorDataset,
)


@pytest.fixture()
def train_ds(toy_corpus, toy_dataset_dir):
    import os

    return RetrievalDataset(
        [os.path.join(toy_dataset_dir, "train.json")],
        toy_corpus,
        num_negatives=2,
        num_in_file_negatives=1,
        max_seq_len=256,
        is_train=True,
        seed=7,
    )


class TestRetrievalDataset:
    def test_train_flattening(self, train_ds):
        # One example per (tactic, pos_premise); the premise-less theorem
        # contributes nothing in training (`retrieval/datamodule.py:59-74`).
        assert len(train_ds) == 2
        names = {ex["pos_premise"].full_name for ex in train_ds.data}
        assert names == {"Nat.gcd_succ", "Nat.mod_self"}

    def test_eval_flattening(self, toy_corpus, toy_dataset_dir):
        import os

        ds = RetrievalDataset(
            [os.path.join(toy_dataset_dir, "val.json")],
            toy_corpus,
            num_negatives=2,
            num_in_file_negatives=1,
            max_seq_len=256,
            is_train=False,
        )
        # One example per tactic, including the premise-less one.
        assert len(ds) == 3
        assert ds[2]["all_pos_premises"] == []

    def test_negative_sampling(self, train_ds):
        ex = train_ds[0]
        negs = ex["neg_premises"]
        assert len(negs) == 2
        pos = ex["pos_premise"]
        assert all(n != pos for n in negs)
        # "In-file" = the positive's file (a.lean): exactly one in-file
        # negative was requested and a.lean has 3 candidates, so the first
        # sampled negative lives in a.lean.
        assert negs[0].path == "a.lean"
        # Second negative is out-of-file (b.lean or c.lean accessible files).
        assert negs[1].path in ("b.lean", "c.lean")

    def test_collate_label_matrix(self, train_ds):
        examples = [train_ds[0], train_ds[1]]
        batch = train_ds.collate(examples)
        b, n = 2, 2
        assert batch["premise_ids"].shape[0] == b * (1 + n)
        label = batch["label"]
        assert label.shape == (b, b * (1 + n))
        # Diagonal of the positive block is 1.
        assert label[0, 0] == 1.0 and label[1, 1] == 1.0
        # The two tactics have disjoint positives.
        assert label[0, 1] == 0.0 and label[1, 0] == 0.0
        # A negative that happens to be another's positive must be labeled 1
        # (`retrieval/datamodule.py:163-173`): simulate by injecting.
        ex0 = dict(examples[0])
        ex0["neg_premises"] = [examples[1]["pos_premise"], ex0["neg_premises"][1]]
        batch2 = train_ds.collate([ex0, examples[1]])
        # Column b + 0*b + 0 = example 0's first negative == ex1's positive.
        assert batch2["label"][1, 2] == 1.0

    def test_strict_negatives_raises_on_scarce_pool(
        self, toy_corpus, toy_dataset_dir
    ):
        # Reference parity: `random.sample` errors when the accessible
        # out-of-file pool is smaller than requested
        # (`/root/reference/retrieval/datamodule.py:121-127`). The toy corpus
        # has far fewer accessible premises than 50 negatives.
        import os

        ds = RetrievalDataset(
            [os.path.join(toy_dataset_dir, "train.json")],
            toy_corpus,
            num_negatives=50,
            num_in_file_negatives=1,
            max_seq_len=256,
            is_train=True,
            seed=7,
            strict_negatives=True,
        )
        with pytest.raises(ValueError, match="strict negative sampling"):
            _ = ds[0]

    def test_strict_negatives_ok_when_pool_suffices(
        self, toy_corpus, toy_dataset_dir
    ):
        import os

        ds = RetrievalDataset(
            [os.path.join(toy_dataset_dir, "train.json")],
            toy_corpus,
            num_negatives=2,
            num_in_file_negatives=1,
            max_seq_len=256,
            is_train=True,
            seed=7,
            strict_negatives=True,
        )
        ex = ds[0]
        assert len(ex["neg_premises"]) == 2
        assert all(n != ex["pos_premise"] for n in ex["neg_premises"])

    def test_collate_shapes_bucketed(self, train_ds):
        batch = train_ds.collate([train_ds[0], train_ds[1]])
        assert batch["context_ids"].shape[1] % 128 == 0
        assert batch["premise_ids"].shape[1] % 128 == 0
        assert batch["context_ids"].shape == batch["context_mask"].shape

    def test_datamodule_splits(self, toy_corpus_path, toy_dataset_dir):
        dm = RetrievalDataModule(
            data_path=toy_dataset_dir,
            corpus_path=toy_corpus_path,
            num_negatives=2,
            num_in_file_negatives=1,
            batch_size=2,
            eval_batch_size=4,
            max_seq_len=256,
        )
        dm.setup()
        assert len(dm.ds_train) == 2
        assert len(dm.ds_val) == 3
        # predict = train + val + test (`retrieval/datamodule.py:255-267`)
        assert len(dm.ds_pred) == 9
        batches = list(dm.train_dataloader())
        assert len(batches) == 1  # drop_last with bs=2 over 2 examples


class TestLoader:
    def test_shuffle_and_drop_last(self):
        class Identity:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return i

            def collate(self, xs):
                return xs

        loader = Loader(Identity(10), 4, shuffle=True, drop_last=True, seed=1)
        batches = list(loader)
        assert len(batches) == 2 and all(len(b) == 4 for b in batches)
        loader2 = Loader(Identity(10), 4, shuffle=False, drop_last=False)
        batches2 = list(loader2)
        assert [len(b) for b in batches2] == [4, 4, 2]
        assert batches2[0] == [0, 1, 2, 3]


class TestGeneratorDataset:
    def test_pairs_and_marks(self, toy_dataset_dir):
        import os

        ds = GeneratorDataset(
            os.path.join(toy_dataset_dir, "train.json"),
            corpus=None,
            preds=None,
            max_inp_seq_len=512,
            max_oup_seq_len=128,
            p_drop=0.0,
            is_train=True,
        )
        assert len(ds) == 3
        ex = ds[0]
        assert "<a>" not in ex["tactic"] and "<a>" not in ex["state"]

    def test_collate_neg100(self, toy_dataset_dir):
        import os

        ds = GeneratorDataset(
            os.path.join(toy_dataset_dir, "train.json"),
            corpus=None,
            preds=None,
            max_inp_seq_len=512,
            max_oup_seq_len=128,
            p_drop=0.0,
            is_train=True,
        )
        batch = ds.collate([ds[0], ds[1], ds[2]])
        tid = batch["tactic_ids"]
        mask = batch["tactic_mask"]
        assert (tid[mask == 0] == -100).all()
        assert (tid[mask == 1] >= 0).all()
        assert batch["state_ids"].shape[1] % 128 == 0

    def test_augmentation(self, toy_corpus, toy_dataset_dir):
        import os

        # Fake predictions: retrieve the corpus's first two premises.
        prems = toy_corpus.all_premises[:2]
        theorems_states = [
            ("d.lean", "gcd_self", "n : ℕ\n⊢ gcd n n = n"),
            ("d.lean", "gcd_self", "n : ℕ\n⊢ gcd (n % n) n = n"),
            ("d.lean", "d_late", "⊢ 2 = 2"),
        ]
        preds = {
            key: {"retrieved_premises": prems} for key in theorems_states
        }
        ds = GeneratorDataset(
            os.path.join(toy_dataset_dir, "train.json"),
            corpus=toy_corpus,
            preds=preds,
            max_inp_seq_len=2048,
            max_oup_seq_len=128,
            p_drop=0.0,
            is_train=True,
        )
        ex = ds[0]
        # Premises prepended (highest-scored adjacent to the state).
        assert ex["state"].endswith("⊢ gcd n n = n")
        assert prems[0].full_name in ex["state"]

    def test_generator_datamodule(self, toy_dataset_dir):
        dm = GeneratorDataModule(
            data_path=toy_dataset_dir,
            batch_size=2,
            eval_batch_size=2,
            max_inp_seq_len=512,
            max_oup_seq_len=128,
            p_drop=0.5,
        )
        dm.setup("fit")
        assert len(dm.ds_train) == 3
        val_batches = list(dm.val_dataloader())
        assert sum(len(b["state"]) for b in val_batches) == 3
