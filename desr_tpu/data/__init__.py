"""Data layer: unpaired RGB-D datasets + loader (reference: data/).

``create_dataset(opt, dataset_cls, stage)`` mirrors data/__init__.py:48-96 —
returns an iterable of collated numpy batch dicts, with a thread-pool
prefetcher replacing torch DataLoader workers.
"""

from desr_tpu.data.loader import create_dataset, DataLoader
from desr_tpu.data.i2d_dataset import I2DDataset
from desr_tpu.data.main_dataset import MainDataset
from desr_tpu.data.sr_dataset import NaiveSRDataset
from desr_tpu.data.translation_dataset import TranslationDataset
from desr_tpu.data.legacy_datasets import find_dataset_using_name


def get_option_setter(dataset_mode):
    """Dataset-level dynamic flag injection (reference data/__init__.py:42-45)."""
    try:
        cls = find_dataset_using_name(dataset_mode)
    except NotImplementedError:
        cls = None

    def setter(parser, is_train):
        if cls is not None and hasattr(cls, "modify_commandline_options"):
            try:
                return cls.modify_commandline_options(parser, is_train)
            except Exception:
                return parser
        return parser

    return setter


def dataset_for_model(opt):
    """main.py:29-43 model_type -> dataset class dispatch."""
    if opt.model_type == "I2D":
        return I2DDataset
    if opt.model_type == "main":
        return NaiveSRDataset if getattr(opt, "SR", False) else MainDataset
    if opt.model_type == "translation":
        return TranslationDataset
    raise KeyError(opt.model_type)
