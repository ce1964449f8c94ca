"""Model registry (reference: models/__init__.py:25-69).

The reference dispatches on ``--model_type`` in {I2D, main, translation} with
an ``--SR`` sub-switch selecting MainSRModel (main.py:29-43); the ``--model``
flag is decorative (SURVEY §2.12). Same here.
"""

from __future__ import annotations


def _model_class(model_type, sr=False):
    if model_type == "I2D":
        from desr_tpu.models.i2d_model import I2DModel

        return I2DModel
    if model_type == "main":
        if sr:
            from desr_tpu.models.main_sr_model import MainSRModel

            return MainSRModel
        from desr_tpu.models.main_model import MainModel

        return MainModel
    if model_type == "translation":
        from desr_tpu.models.translation_model import TranslationModel

        return TranslationModel
    raise KeyError(f"unknown model_type {model_type}")


def get_option_setter(model_type):
    def setter(parser, is_train):
        cls = _model_class(model_type)
        if hasattr(cls, "modify_commandline_options"):
            parser = cls.modify_commandline_options(parser, is_train)
        return parser

    return setter


def create_model(opt):
    cls = _model_class(opt.model_type, sr=getattr(opt, "SR", False))
    instance = cls(opt)
    print(f"model [{cls.__name__}] was created")
    return instance
