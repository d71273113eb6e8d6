from ensem3a_openclraytracer_tpu.cli import main

raise SystemExit(main())
