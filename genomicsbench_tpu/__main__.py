from genomicsbench_tpu.cli import main

main()
