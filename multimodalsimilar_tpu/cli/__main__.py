from multimodalsimilar_tpu.cli import main

main()
