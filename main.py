"""CLI driver — train AND test for all 4 model types.

Mirrors the reference's main.py:21-132 flow and flag surface: dispatch on
``--model_type`` (+ ``--SR``), epoch loop with ``--do_train`` / ``--do_test``,
periodic loss prints / wandb logging, ``latest`` + per-epoch checkpoints, and
per-epoch LR stepping. The compute path underneath is one jitted data-parallel
step per model (see desr_tpu.models.*).

Example (README.md:28 equivalent):
    python main.py --model_type I2D --do_train --do_test --image_and_depth \
        --use_scannet --batch_size 12 --lr 2e-4 --n_epochs 150 --n_epochs_decay 150 \
        --path_A ... --path_B ... --A_add_paths ... --B_add_paths ...
"""

from __future__ import annotations

import time
from collections import OrderedDict

from desr_tpu.options.train_options import TrainOptions
from desr_tpu.data import create_dataset, dataset_for_model
from desr_tpu.models import create_model


def sum_of_dicts(dict1, dict2, l):
    return OrderedDict([(key, dict1.get(key, 0.0) + dict2[key] / l) for key in dict2.keys()])


def main():
    opt = TrainOptions().parse()

    wandb = None
    if opt.use_wandb:
        try:
            import wandb as _wandb

            wandb = _wandb
            wandb.init(project="translation_compare")
            wandb.config.update(opt)
        except ImportError:
            print("wandb not available; falling back to console logging")

    profile_dir = getattr(opt, "profile_dir", "")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    model = create_model(opt)
    dataset_cls = dataset_for_model(opt)
    # device_put_fn: host->device transfers dispatch inside the loader the
    # moment a host batch is ready, overlapping the in-flight device step.
    # With --steps_per_call > 1 batches are instead stacked host-side into
    # step groups (shard_batch_steps) and transferred once per group — the
    # group transfer overlaps the previous group's device execution.
    put_fn = model.shard if getattr(opt, "steps_per_call", 1) <= 1 else None
    dataset = (create_dataset(opt, dataset_cls, device_put_fn=put_fn)
               if opt.do_train else None)
    test_dataset = (create_dataset(opt, dataset_cls, stage="test", device_put_fn=model.shard)
                    if opt.do_test else None)
    if dataset is not None:
        print("The number of training images = %d" % len(dataset))

    model.setup(opt)

    from desr_tpu.utils.visualizer import Visualizer

    visualizer = Visualizer(opt)

    total_iters = opt.start_iter
    plateau_metric = None  # running eval/train loss feeding --lr_policy plateau
    for epoch in range(opt.epoch_count, opt.n_epochs + opt.n_epochs_decay + opt.epoch_count):
        epoch_start_time = time.time()
        model._epoch = epoch

        if opt.do_train:
            model._train()
            # --steps_per_call N: run N optimizer steps per device dispatch
            # (lax.scan inside one jitted program, base_model.jit_train_scan)
            spc = max(1, getattr(opt, "steps_per_call", 1)) if model.supports_multi_step() else 1
            group = []

            def at_freq(freq):
                d = (total_iters - opt.start_iter) % freq
                return d == 0 if spc == 1 else d < opt.batch_size * spc

            iter_data_time = time.time()
            for i, data in enumerate(dataset):
                iter_start_time = time.time()
                t_data = iter_start_time - iter_data_time
                if spc > 1:
                    group.append(data)
                    if len(group) < spc:
                        iter_data_time = time.time()
                        continue
                    total_iters += opt.batch_size * len(group)
                    model.optimize_parameters_multi(group, total_iters)
                    group = []
                else:
                    total_iters += opt.batch_size
                    model.set_input(data)
                    model.optimize_parameters(total_iters, opt.update_ratio)

                if at_freq(opt.display_freq) and (
                        wandb or not getattr(opt, "no_html", False)):
                    # image panels (reference main.py:76-81): wandb figures, or
                    # the HTML gallery when wandb is off. calculate() runs an
                    # extra eval forward for the visuals; restore train metrics.
                    if spc > 1:
                        model.set_input(data)  # multi path never staged _batch
                    train_metrics = model.metrics
                    model.calculate(stage="train")
                    visuals = model.get_current_visuals()
                    model.metrics = train_metrics
                    if wandb:
                        from desr_tpu.utils import plots

                        plot_fn = {"I2D": plots.plot_I2D, "main": plots.plot_main,
                                   "translation": plots.plot_translation}[opt.model_type]
                        plot_fn(wandb, visuals, total_iters, stage="train")
                    elif not getattr(opt, "no_html", False):
                        # the gallery replaces the reference's visdom panels
                        # (its own HTML path is dead code in main.py — the
                        # visualizer is constructed but display_current_results
                        # is never called, reference main.py:76-81); --no_html
                        # is the gallery's opt-out, as upstream intended
                        visualizer.display_current_results(visuals, epoch)

                if at_freq(opt.print_freq):
                    losses = model.get_current_losses()
                    t_comp = (time.time() - iter_start_time) / (opt.batch_size * spc)
                    visualizer.print_current_losses(epoch, total_iters, losses, t_comp, t_data)
                    if wandb:
                        wandb.log(losses, step=total_iters)

                if at_freq(opt.save_latest_freq * opt.batch_size):
                    print("saving the latest model (epoch %d, total_iters %d)" % (epoch, total_iters))
                    suffix = "iter_%d" % total_iters if opt.save_by_iter else "latest"
                    model.save_networks(suffix)
                iter_data_time = time.time()

            if group:  # epoch tail shorter than --steps_per_call
                total_iters += opt.batch_size * len(group)
                model.optimize_parameters_multi(group, total_iters)
                group = []

            if epoch % opt.save_epoch_freq == 0:
                print("saving the model at the end of epoch %d, iters %d" % (epoch, total_iters))
                model.save_networks("latest")
                model.save_networks(epoch)
            print("End of epoch %d / %d \t Time Taken: %d sec"
                  % (epoch, opt.n_epochs + opt.n_epochs_decay, time.time() - epoch_start_time))
            if not opt.do_test:
                losses = model.get_current_losses()
                if losses:
                    plateau_metric = float(next(iter(losses.values())))
            model.update_learning_rate(epoch, metric=plateau_metric)

        if opt.do_test:
            model.eval()
            mean_losses = OrderedDict()
            l = max(len(test_dataset), 1)
            for i, data in enumerate(test_dataset):
                model.set_input(data)
                model.calculate(stage="test")
                losses = model.get_current_losses()
                mean_losses = sum_of_dicts(mean_losses, losses, l / max(opt.batch_size_val, 1))
            if mean_losses:
                # feed the plateau LR policy with the epoch's mean test loss
                plateau_metric = float(next(iter(mean_losses.values())))
            if wandb:
                wandb.log({"test": dict(mean_losses)}, step=total_iters)
            print("stage:  test")
            print(dict(mean_losses))
            print("=" * 85)

        if not opt.do_train:
            break

    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")


if __name__ == "__main__":
    main()
