"""Console + per-host file logging, with optional wandb.

Capability parity with reference `contrast/logger.py`: colored console on
process 0, a log file per host (`log.txt`, `log.txt.hostN`), cached setup,
wandb run names composed from the hyperparameters."""

from __future__ import annotations

import functools
import logging
import os
import sys


class _ColorFormatter(logging.Formatter):
    GREY, YELLOW, RED, RESET = "\x1b[2m", "\x1b[33;1m", "\x1b[31;1m", "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        if record.levelno >= logging.ERROR:
            return self.RED + msg + self.RESET
        if record.levelno >= logging.WARNING:
            return self.YELLOW + msg + self.RESET
        return msg


@functools.lru_cache(maxsize=None)
def setup_logger(output: str = "", host_id: int = 0,
                 name: str = "pixflow") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = "[%(asctime)s %(name)s]: %(levelname)s %(message)s"

    if host_id == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(_ColorFormatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(ch)

    if output:
        os.makedirs(output, exist_ok=True)
        filename = os.path.join(
            output, "log.txt" if host_id == 0 else f"log.txt.host{host_id}")
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(fh)

    return logger


def wandb_run_name(cfg) -> str:
    """Auto-composed run name from hyperparameters (capability of reference
    `logger.py:100-121`)."""
    parts = [cfg.model.arch, f"ep{cfg.optim.epochs}",
             f"bs{cfg.data.batch_size}", f"nf{cfg.data.n_frames}"]
    if cfg.flow.use_flow:
        parts.append("flow")
        if cfg.flow.use_flow_file:
            parts.append("file")
        if cfg.flow.alpha1 is not None:
            parts.append(f"a1{cfg.flow.alpha1}_a2{cfg.flow.alpha2}")
    return "-".join(parts)


def init_wandb(cfg):
    """Gated wandb init: silently disabled when wandb is unavailable or
    cfg.runtime.wandb is False (the reference hard-requires wandb with a
    hardcoded entity, `logger.py:124-132`; here it is opt-in)."""
    if not cfg.runtime.wandb:
        return None
    try:
        import wandb
    except ImportError:
        return None
    run = wandb.init(project=cfg.runtime.wandb_project,
                     entity=cfg.runtime.wandb_entity or None,
                     name=wandb_run_name(cfg),
                     config=__import__("json").loads(cfg.to_json()))
    # upload the dumped config file with the run, like the reference
    # (`main_pretrain.py:388` wandb.save(config.json))
    cfg_path = os.path.join(cfg.runtime.output_dir, "config.json")
    if os.path.exists(cfg_path):
        wandb.save(cfg_path, base_path=cfg.runtime.output_dir)
    return run
