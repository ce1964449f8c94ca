"""Offline metrics CLI — same surface as the reference's new_metrics.py.

    python new_metrics.py --input_path ... --pred_path ... --target_path ... \
        [--max_depth 5100] [--n_cpus 10] [--intr_root /path/to/Scannet]

Implementation lives in desr_tpu.metrics (the shared parity oracle).
"""

from desr_tpu.metrics import main

if __name__ == "__main__":
    main()
