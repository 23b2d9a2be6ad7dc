"""Console coloring + logging helpers (reference: torch_points3d/utils/colors.py)."""
import logging
import sys

log = logging.getLogger("dpcr_agb_tpu")


class COLORS:
    TRAIN_COLOR = "\033[0;92m"
    VAL_COLOR = "\033[0;94m"
    TEST_COLOR = "\033[0;93m"
    BEST_COLOR = "\033[0;92m"
    END_TOKEN = "\033[0m)"
    END_NO_TOKEN = "\033[0m"
    Red = "\033[0;91m"
    Green = "\033[0;92m"
    Yellow = "\033[0;93m"
    Blue = "\033[0;94m"
    Cyan = "\033[0;96m"


def colored_print(color: str, msg: str) -> None:
    print(color + msg + COLORS.END_NO_TOKEN)


def setup_logging(level=logging.INFO, logfile: str = None) -> None:
    handlers = [logging.StreamHandler(sys.stdout)]
    if logfile:
        handlers.append(logging.FileHandler(logfile))
    logging.basicConfig(
        level=level,
        format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
        handlers=handlers,
        force=True,
    )
