"""Test options (reference: options/test_options.py:10-23)."""

from __future__ import annotations

from desr_tpu.options.train_options import TrainOptions


class TestOptions(TrainOptions):
    def initialize(self, parser):
        parser = TrainOptions.initialize(self, parser)
        parser.add_argument("--results_dir", type=str, default="./results/")
        parser.add_argument("--aspect_ratio", type=float, default=1.0)
        parser.set_defaults(phase="test")
        self.isTrain = False
        return parser
