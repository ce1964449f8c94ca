from desr_tpu.options.base_options import BaseOptions
from desr_tpu.options.train_options import TrainOptions
from desr_tpu.options.test_options import TestOptions
