"""``python -m efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu CONFIG [--test]``
— alias for the ``.main`` composition root."""
import logging

from .main import _parse_args, main

if __name__ == "__main__":
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    args = _parse_args()
    main(args.config_path, args.test)
