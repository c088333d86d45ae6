"""Training pipeline: YAML config -> dataloaders -> stage trainer -> loop.

Equivalent of the reference train pipeline (basicsr/train.py:110-220):
resume-state handling, experiment dirs, message logging with ETA, periodic
checkpointing/validation. Distribution is mesh-based (jax.distributed for
multi-host) instead of NCCL process groups; per-host data sharding comes
from EnlargedSampler(num_replicas=process_count, rank=process_index).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import time


def _honor_cpu_platform_env():
    """JAX_PLATFORMS=cpu in the environment must actually keep jax off
    the TPU plugin: the experimental axon plugin ignores the env vars
    and still probes the tunnel at backend init (a crashed tunnel
    worker turns that probe into a ~25-min hang). The config update
    restricts backend discovery outright. No-op unless the user asked
    for CPU."""
    if os.environ.get('JAX_PLATFORMS', '').lower() == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_platform_name', 'cpu')
    # persistent compilation cache: the 512^2 train-step compile takes
    # tens of minutes on a tunneled TPU — restarts and resumes must not
    # pay it again (override location with JAX_CACHE_DIR)
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))


def parse_options(root_path: str, args=None):
    _honor_cpu_platform_env()
    from codeformer_tpu.utils.options import parse
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--launcher', choices=['none', 'jax'],
                        default='none',
                        help='jax = multi-host jax.distributed.initialize')
    parser.add_argument('--force_yml', nargs='+', default=None)
    parsed = parser.parse_args(args)
    opt = parse(parsed.opt, root_path, is_train=True)
    if parsed.launcher == 'jax':
        import jax
        jax.distributed.initialize()
    # force-override yml options: key=value pairs
    for entry in parsed.force_yml or []:
        keys, value = entry.split('=', 1)
        node = opt
        key_list = keys.split(':')
        for k in key_list[:-1]:
            node = node[k]
        import yaml
        node[key_list[-1]] = yaml.safe_load(value)
    return opt


def create_train_val_dataloader(opt, logger):
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader, EnlargedSampler

    train_loader, val_loader = None, None
    total_iters = int(opt['train']['total_iter'])
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            train_set = build_dataset(dataset_opt)
            sampler = EnlargedSampler(
                len(train_set), jax.process_count(), jax.process_index(),
                dataset_opt.get('dataset_enlarge_ratio', 1))
            train_loader = build_dataloader(train_set, dataset_opt,
                                            sampler=sampler)
            logger.info(f'Training set [{dataset_opt["name"]}]: '
                        f'{len(train_set)} images, batch '
                        f'{dataset_opt["batch_size_per_gpu"]}')
        elif phase.split('_')[0] == 'val':
            val_set = build_dataset(dataset_opt)
            val_loader = build_dataloader(val_set, dataset_opt,
                                          is_train=False)
            logger.info(f'Validation set [{dataset_opt["name"]}]: '
                        f'{len(val_set)} images')
    return train_loader, val_loader, total_iters


def train_pipeline(root_path: str, args=None):
    from codeformer_tpu.utils.logger import (MessageLogger, get_env_info,
                                             get_root_logger,
                                             init_tb_logger)
    from codeformer_tpu.utils.misc import mkdir_and_rename, set_random_seed
    from codeformer_tpu.utils.misc import setup_jax
    from codeformer_tpu.train.trainers import build_model
    import jax

    setup_jax()
    # the colpack Pallas kernels are forward-only (no VJP) and the int8
    # quantize round has zero gradient; a stray CODEFORMER_COLPACK/
    # CODEFORMER_QUANT in the env must never reach jax.grad
    from codeformer_tpu.nn.blocks import set_colpack_mode
    from codeformer_tpu.nn.quant import set_quant_mode
    set_colpack_mode('off')
    set_quant_mode('off')
    opt = parse_options(root_path, args)
    seed = opt.get('manual_seed', 0) or 0
    set_random_seed(seed + jax.process_index())

    resume_state_path = (opt.get('path') or {}).get('resume_state')

    if jax.process_index() == 0 and not resume_state_path:
        mkdir_and_rename(opt['path']['experiments_root'])
    for key in ('models', 'training_states', 'visualization'):
        os.makedirs(opt['path'][key], exist_ok=True)

    log_file = osp.join(opt['path']['log'],
                        f'train_{opt["name"]}_{int(time.time())}.log')
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())

    tb_logger = None
    if (opt.get('logger') or {}).get('use_tb_logger') and \
            'debug' not in opt['name'] and jax.process_index() == 0:
        tb_logger = init_tb_logger(
            osp.join(opt['path']['experiments_root'], 'tb_logger'))

    train_loader, val_loader, total_iters = \
        create_train_val_dataloader(opt, logger)

    model = build_model(opt)
    start_epoch, current_iter = 0, 0
    if resume_state_path:
        start_epoch, current_iter = model.resume_training(
            resume_state_path)
        logger.info(f'Resuming from epoch {start_epoch}, '
                    f'iter {current_iter}')

    msg_logger = MessageLogger(opt, current_iter + 1, tb_logger)
    logger_opt = opt.get('logger') or {}
    print_freq = logger_opt.get('print_freq', 100)
    save_freq = logger_opt.get('save_checkpoint_freq', 10 ** 9)
    val_opt = opt.get('val') or {}
    val_freq = val_opt.get('val_freq', float('inf'))

    logger.info(f'Start training from epoch {start_epoch}, '
                f'iter {current_iter}')
    # reference prefetch_mode 'cuda' -> the device-put-ahead prefetcher
    # (prefetch_dataloader.py:84-125); 'cpu'/None need nothing extra: the
    # loader already produces batches from a host-side thread pool
    prefetch_mode = (opt['datasets']['train'] or {}).get('prefetch_mode')
    if prefetch_mode in ('cuda', 'device'):
        from codeformer_tpu.data.loader import DevicePrefetcher
        train_loader = DevicePrefetcher(train_loader,
                                        stage=model._stage_batch)
        logger.info('Use DevicePrefetcher (double-buffered device feed)')
    data_time = time.time()
    epoch = start_epoch
    for batch in train_loader:
        iter_start = time.time()
        d_time = iter_start - data_time
        current_iter += 1
        if current_iter > total_iters:
            break
        model.feed_data(batch)
        model.optimize_parameters(current_iter)
        iter_time = time.time() - iter_start

        if current_iter % print_freq == 0:
            log_vars = {'epoch': epoch, 'iter': current_iter,
                        'lrs': model.get_current_learning_rate(),
                        'time': iter_time, 'data_time': d_time}
            log_vars.update(model.get_current_log())
            msg_logger(log_vars)

        if current_iter % save_freq == 0 and jax.process_index() == 0:
            logger.info('Saving models and training states.')
            model.save(epoch, current_iter)

        if val_loader is not None and current_iter % val_freq == 0:
            model.validation(val_loader, current_iter, tb_logger,
                             save_img=val_opt.get('save_img', False))
        data_time = time.time()

    logger.info('End of training.')
    if jax.process_index() == 0:
        model.save(epoch, -1)
    return model


# validation lives on the trainers now (BaseTrainer.validation: EMA
# test() forward + per-image visualization dumps + metric averaging,
# the sr_model.py:120-194 surface)
