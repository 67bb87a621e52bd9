"""``litpose`` command-line interface (reference lightning_pose/cli/)."""
