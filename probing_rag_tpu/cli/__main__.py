from probing_rag_tpu.cli.main import main

main()
