"""Orchestration CLIs.

Every script exposes ``main(arg_list=None)`` parsed by argparse so the
master script composes phases in-process by building argv lists — the
reference's composition convention (master_script.py:7-10,80-96).
"""
