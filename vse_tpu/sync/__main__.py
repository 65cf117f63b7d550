from vse_tpu.sync.cli import main

main()
