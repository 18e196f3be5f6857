package graft
/** Stages raw JSONL then invokes the real CLI main with user-style args. */
object StageCli {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/cli_demo"
    def write(ds: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/raw/$ds/2026-08-12")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve("records.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    }
    val ts = NotionFixtures.timesliceJson.replace(
      "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb", "22222222-2222-2222-2222-222222222222")
    write("timeslices", Seq(ts, NotionFixtures.dbJson))
    write("workflowStages", Seq(NotionFixtures.stageJson))
    write("workflowDefinitions", Seq(NotionFixtures.defJson))
    // the real user surface: Cli.main with the same argv a shell would pass
    graft.notion.Cli.main(Array("normalize", dir))
    graft.notion.Cli.main(Array("excel:export", dir, s"$dir/star.xlsx"))
  }
}
