"""Training loggers (reference: basicsr/utils/logger.py): console message
logger with ETA, optional TensorBoard scalars, rank0-only file logging.
wandb is gated (not available in this environment)."""
from __future__ import annotations

import datetime
import logging
import time
from typing import Dict, Optional

_initialized_loggers = set()


class MessageLogger:
    """Formats iteration logs: epoch/iter/lr/time/ETA + losses
    (logger.py:10-74)."""

    def __init__(self, opt: Dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt['name']
        logger_opt = opt.get('logger') or {}
        self.interval = logger_opt.get('print_freq', 100)
        self.start_iter = start_iter
        self.max_iters = opt['train']['total_iter']
        self.use_tb_logger = bool(logger_opt.get('use_tb_logger'))
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars: Dict):
        epoch = log_vars.pop('epoch')
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs')
        message = (f'[{self.exp_name[:5]}..][epoch:{epoch:3d}, '
                   f'iter:{current_iter:8,d}, lr:(')
        message += ', '.join(f'{lr:.3e}' for lr in lrs) + ')] '

        if 'time' in log_vars:
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time', 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += (f'[eta: {eta_str}, time (data): '
                        f'{iter_time:.3f} ({data_time:.3f})] ')

        for k, v in log_vars.items():
            message += f'{k}: {v:.4e} '
            if self.tb_logger and self.use_tb_logger and \
                    'debug' not in self.exp_name:
                key = f'losses/{k}' if k.startswith('l_') else k
                self.tb_logger.add_scalar(key, float(v), current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        get_root_logger().warning('tensorboard unavailable; scalars will '
                                  'only go to the console log')
        return None
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt):
    """wandb in tb-sync mode (reference logger.py:84-102). Gated: wandb is
    not installed in this image."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning('wandb unavailable; skipping')
        return
    logger = get_root_logger()
    project = (opt['logger']['wandb'] or {}).get('project')
    resume_id = (opt['logger']['wandb'] or {}).get('resume_id')
    if resume_id:
        wandb.init(id=resume_id, resume='allow', name=opt['name'],
                   config=opt, project=project, sync_tensorboard=True)
    else:
        wandb.init(name=opt['name'], config=opt, project=project,
                   sync_tensorboard=True)
    logger.info(f'Use wandb logger with id={wandb.run.id}; '
                f'project={project}.')


def get_root_logger(logger_name: str = 'codeformer_tpu',
                    log_level: int = logging.INFO,
                    log_file: Optional[str] = None) -> logging.Logger:
    """Process-wide logger; file handler only on process 0
    (the jax.process_index()==0 analog of rank0-only logging,
    reference logger.py:105-142)."""
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger
    fmt = '%(asctime)s %(levelname)s: %(message)s'
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)
    logger.propagate = False
    is_main = True
    try:
        import jax
        is_main = jax.process_index() == 0
    except Exception:
        pass
    if not is_main:
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, 'w')
            fh.setFormatter(logging.Formatter(fmt))
            logger.addHandler(fh)
    _initialized_loggers.add(logger_name)
    return logger


def get_env_info() -> str:
    import jax
    import flax
    msg = ('\ncodeformer_tpu'
           f'\n\tJAX: {jax.__version__}'
           f'\n\tflax: {flax.__version__}'
           f'\n\tbackend: {jax.default_backend()}'
           f'\n\tdevices: {[str(d) for d in jax.devices()]}')
    return msg
