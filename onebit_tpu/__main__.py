from onebit_tpu.cli import main

main()
