from dsdneo_tpu.cli import main

raise SystemExit(main())
