from jpgenc_tpu.cli import main

raise SystemExit(main())
